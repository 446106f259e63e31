package graft.harness

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the versioned-view parser (r19):
  * randomly rendered canonical deduplication views round-trip through
  * [[TemporalJoin.versionedViewOf]] with the inferred metadata equal
  * to the rendered inputs, and every non-versioned mutation (ASC
  * ordering, a pinned rank other than 1, a projected rank column, a
  * star projection) parses to None — the shape law cannot be tripped
  * by identifier choice, whitespace, or qualifier style.
  */
class VersionedViewPropSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val ident: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(5, Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
  } yield (h :: t).mkString

  private case class Shape(src: String, tcol: String, rn: String,
      keys: List[String], extra: List[String], alias: Option[String],
      qualify: Boolean, ws: String,
      renames: List[Option[(String, Boolean)]]) {
    /** The outer projection as (source, output) pairs — a rename maps
      * the source onto its target (r20: in-body AS is legal). */
    def items: List[(String, String)] =
      ((keys :+ tcol) ++ extra).zip(renames).map {
        case (src, ren) => src -> ren.map(_._1).getOrElse(src)
      }
  }

  private val shape: Gen[Shape] = for {
    names <- Gen.listOfN(13, ident)
      .suchThat(ns => ns.distinct.size == ns.size)
    nKeys <- Gen.choose(1, 3)
    alias <- Gen.option(Gen.const(names(7)))
    qualify <- Gen.oneOf(true, false)
    ws <- Gen.oneOf(" ", "  ", "\n  ")
    // each projected item optionally renamed (target, explicit-AS?)
    renames <- Gen.sequence[List[Option[(String, Boolean)]],
      Option[(String, Boolean)]](
      names.slice(8, 8 + nKeys + 2).map(t =>
        Gen.option(Gen.oneOf(true, false).map(as => (t, as)))))
  } yield Shape(names.head, names(1), names(2),
    names.slice(3, 3 + nKeys), names.slice(6, 7), alias, qualify, ws,
    renames)

  private def render(s: Shape): String = {
    val q = s.alias.filter(_ => s.qualify).map(_ + ".").getOrElse("")
    val items = ((s.keys :+ s.tcol) ++ s.extra).zip(s.renames).map {
      case (src, None) => q + src
      case (src, Some((t, true))) => s"$q$src AS $t"
      case (src, Some((t, false))) => s"$q$src $t"
    }
    s"""SELECT${s.ws}${items.mkString(s",${s.ws}")}
       |FROM (SELECT *,${s.ws}ROW_NUMBER() OVER (PARTITION BY
       |  ${s.keys.mkString(", ")} ORDER BY ${s.tcol} DESC) AS ${s.rn}
       |  FROM ${s.src})${s.alias.map(" " + _).getOrElse("")}
       |WHERE $q${s.rn} = 1""".stripMargin
  }

  test("canonical dedup views round-trip with the rendered metadata") {
    checkProp(Prop.forAll(shape) { s =>
      TemporalJoin.versionedViewOf(render(s)) ==
        Some(TemporalJoin.VersionedView(s.src, s.tcol, s.keys, s.items))
    })
  }

  test("non-versioned mutations never parse") {
    checkProp(Prop.forAll(shape) { s =>
      val ok = render(s)
      val asc = ok.replace(s"ORDER BY ${s.tcol} DESC",
        s"ORDER BY ${s.tcol} ASC")
      val rank2 = ok.replace(s"${s.rn} = 1", s"${s.rn} = 2")
      val topN = ok.replace(s"${s.rn} = 1", s"${s.rn} <= 1")
      val withRank = ok.replaceFirst("SELECT" + java.util.regex.Pattern
        .quote(s.ws), s"SELECT${s.ws}${s.rn},${s.ws}")
      val star = (raw"(?s)SELECT.*?FROM \(").r
        .replaceFirstIn(ok, "SELECT * FROM (")
      Seq(asc, rank2, topN, withRank, star)
        .forall(v => TemporalJoin.versionedViewOf(v).isEmpty)
    })
  }
}
