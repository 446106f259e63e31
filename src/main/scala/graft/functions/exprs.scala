package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot inner loops of the dedup /
  * similarity operators.
  *
  * Rationale: Spark's higher-order functions (`transform`/`aggregate`)
  * interpret one lambda dispatch per element (~µs each). A polynomial
  * hash over a 400-char document or a 64-dim dot product per candidate
  * pair pays that dispatch 64-400×/row. These expressions run the loop
  * in one eval (and `PolyHash`/`DotProduct` generate Java code inline),
  * keeping the surrounding operators inside whole-stage codegen.
  *
  * Arithmetic is bit-identical to the DuckDB oracle spellings in
  * [[TextHash]]: same fold order, same mod, int64 throughout.
  */

/** `graft_poly_hash(s)`: h := (h*31 + codepoint) mod 1e9+7 over the
  * string's code points — exactly the DuckDB oracle's per-char
  * `ascii(c)` fold, including for non-ASCII input.
  */
case class PolyHash(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHash.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** `graft_poly_hash2(s)`: the same code-point fold with multiplier 131.
  * An independent second fingerprint: the pair (graft_poly_hash,
  * graft_poly_hash2) is a ~60-bit composite content key, enough for
  * canonicalization to group/join on fixed-width ints instead of raw
  * text (a production deployment would widen to a 128-bit hash; the
  * oracle dialect limits us to arithmetic both engines can spell).
  */
case class PolyHash2(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash2"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash2(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHash.hash2($c);")

  override protected def withNewChildInternal(newChild: Expression): PolyHash2 =
    copy(child = newChild)
}

object PolyHash {
  /** Shared by interpreted + codegen paths. Folds over code points so
    * non-ASCII text hashes identically to the oracle's ascii(c) fold.
    */
  def hash(s: UTF8String): Long = continueHash(0L, s)

  /** Second-fingerprint fold (multiplier 131; 131·2^30 < 2^38, exact
    * in int64 like the 31-fold).
    */
  def hash2(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 131L + cp.toLong) % TextHash.P
      i += Character.charCount(cp)
    }
    h
  }

  /** Continue a fold across a part boundary (used by ShingleHashes). */
  def continueHash(h0: Long, s: UTF8String): Long = {
    val str = s.toString
    var h = h0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp.toLong) % TextHash.P
      i += Character.charCount(cp)
    }
    h
  }
}

/** `graft_minhash_sig(array<long>)`: all K MinHash permutation minima in
  * one pass over the token hashes.
  */
case class MinHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(TextHash.K)(Long.MaxValue)
    var t = 0
    while (t < n) {
      val th = arr.getLong(t)
      var i = 0
      while (i < TextHash.K) {
        val v = (TextHash.A(i) * th + TextHash.B(i)) % TextHash.P
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `graft_shingle_hashes(toks, n)`: polynomial hash of every word
  * n-gram ("tok1 tok2 … tokn", single-space-joined), one native pass —
  * no per-shingle string allocation, no lambda dispatch. Hash values
  * equal `PolyHash` of the joined string: the fold just continues
  * across part boundaries with the space code point.
  */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(toksAny: Any, nAny: Any): Any = {
    val toks = toksAny.asInstanceOf[ArrayData]
    val num = toks.numElements()
    if (num == 0) return new GenericArrayData(Array.empty[Long])
    // shorter docs than the shingle width degrade to ONE whole-doc
    // shingle (mirrored in the DuckDB oracle) instead of an empty set,
    // which would make every short doc share a degenerate signature
    val n = math.min(nAny.asInstanceOf[Int], num)
    val count = num - n + 1
    val parts = new Array[UTF8String](num)
    var i = 0
    while (i < parts.length) {
      parts(i) = toks.getUTF8String(i)
      i += 1
    }
    val out = new Array[Long](count)
    var s = 0
    while (s < count) {
      var h = 0L
      var p = 0
      while (p < n) {
        if (p > 0) h = (h * 31L + ' '.toLong) % TextHash.P
        h = PolyHash.continueHash(h, parts(s + p))
        p += 1
      }
      out(s) = h
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)
}

/** `graft_word_ngrams(toks, n)`: the n-gram strings themselves (for
  * n-gram statistics), one native pass.
  */
case class WordNgrams(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  override protected def nullSafeEval(toksAny: Any, nAny: Any): Any = {
    val toks = toksAny.asInstanceOf[ArrayData]
    val n = nAny.asInstanceOf[Int]
    val count = toks.numElements() - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    var s = 0
    while (s < count) {
      val parts = new Array[UTF8String](2 * n - 1)
      var p = 0
      while (p < n) {
        if (p > 0) parts(2 * p - 1) = WordNgrams.Space
        parts(2 * p) = toks.getUTF8String(s + p)
        p += 1
      }
      out(s) = UTF8String.concat(parts: _*)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNgrams =
    copy(left = newLeft, right = newRight)
}

object WordNgrams {
  val Space: UTF8String = UTF8String.fromString(" ")
}

/** `graft_simhash(array<long>)`: 30-bit SimHash — per-bit ±1 votes over
  * all token hashes, one pass, no explode/shuffle. Bit j is set iff the
  * vote sum is strictly positive (matching the oracle's
  * `SUM(2*((th>>j)&1)-1) > 0`).
  */
case class SimHash(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Long](TextHash.SimBits)
    var t = 0
    while (t < n) {
      val th = arr.getLong(t)
      var j = 0
      while (j < TextHash.SimBits) {
        votes(j) += 2L * ((th >> j) & 1L) - 1L
        j += 1
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < TextHash.SimBits) {
      if (votes(j) > 0L) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** `graft_dot(array<double>, array<double>)`: sequential-order dot
  * product — IEEE-identical to the oracle's explicit left fold.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DotProduct.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.DotProduct.dot($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** `graft_l2_normalize(array<float|double>)`: cast to double, L2-normalize
  * in one codegen'd pass — element-wise cast, sequential-fold self-dot,
  * sqrt, element-wise divide. IEEE-identical to the composed
  * `transform(cast) → graft_dot → sqrt → transform(divide)` pipeline it
  * replaces (and to the oracle's comprehension spelling), but without the
  * per-element interpreted-lambda dispatch those `transform`s pay.
  */
case class L2Normalize(child: Expression)
    extends UnaryExpression {
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_l2_normalize requires array<float> or array<double>, got $other")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_l2_normalize"

  override protected def nullSafeEval(input: Any): Any =
    L2Normalize.normalize(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.L2Normalize.normalize($c, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

object L2Normalize {
  def normalize(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val dv = new Array[Double](n)
    var i = 0
    while (i < n) {
      // unsafe getters read a null slot as 0.0 — fail loudly instead of
      // silently skewing the norm (embeddings are dense by contract)
      if (a.isNullAt(i))
        throw new IllegalStateException(
          s"graft_l2_normalize: null element at index $i; embedding " +
            "vectors must be dense")
      dv(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    var acc = 0.0d
    i = 0
    while (i < n) {
      acc += dv(i) * dv(i)
      i += 1
    }
    val nrm = math.sqrt(acc)
    i = 0
    while (i < n) {
      dv(i) = dv(i) / nrm
      i += 1
    }
    new GenericArrayData(dv)
  }
}

/** `graft_lsh_bucket(array<double>[, planes])`: sign-random-projection
  * LSH bucket id over `planes` hyperplanes (default 8 — 256 buckets).
  * Plane j's i-th component is the deterministic integer
  * `((j*131 + i*31 + 7) mod 19) - 9`; bit j is set iff the sequential
  * dot of the vector with plane j is strictly positive. Arithmetic is
  * IEEE-identical to folding the literal plane arrays with `graft_dot`
  * (the oracle's spelling) — this form just avoids materializing
  * planes×dim literal expression nodes in every query plan. The plane
  * count is the LSH-blocking SCALE KNOB: bucket width ≈ corpus / 2^planes,
  * so pair generation stays bounded by raising planes as the corpus
  * grows (each extra bit halves expected bucket occupancy and quarters
  * within-bucket pair count).
  */
case class LshBucket(child: Expression, planes: Expression)
    extends BinaryExpression {
  override def left: Expression = child
  override def right: Expression = planes
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        // planes is a plan-wide scale knob, not per-row data: a
        // non-foldable INT column would yield per-row plane counts,
        // silently diverging from the documented contract — require
        // foldability and validate the range at analysis time.
        if (planes.dataType != IntegerType || !planes.foldable)
          TypeCheckResult.TypeCheckFailure(
            "graft_lsh_bucket planes must be an INT literal, got " +
              (if (planes.foldable) planes.dataType.simpleString
               else s"non-constant ${planes.dataType.simpleString}"))
        else planes.eval() match {
          case null => TypeCheckResult.TypeCheckFailure(
            "graft_lsh_bucket planes must not be NULL")
          case p: Int if p < 1 || p > 63 => TypeCheckResult.TypeCheckFailure(
            s"graft_lsh_bucket: planes must be in [1, 63], got $p")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_lsh_bucket expects array<double>, got ${other.simpleString}")
    }
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"

  override protected def nullSafeEval(input: Any, p: Any): Any =
    LshBucket.bucket(input.asInstanceOf[ArrayData], p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, p) =>
      s"${ev.value} = graft.functions.LshBucket.bucket($c, $p);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LshBucket =
    copy(child = newLeft, planes = newRight)
}

object LshBucket {
  val Planes = 8
  def w(j: Int, i: Int): Int = ((j * 131 + i * 31 + 7) % 19) - 9
  def bucket(v: ArrayData, planes: Int): Long = {
    if (planes < 1 || planes > 63)
      throw new IllegalArgumentException(
        s"graft_lsh_bucket: planes must be in [1, 63], got $planes")
    val n = v.numElements()
    var sig = 0L
    var j = 0
    while (j < planes) {
      var acc = 0.0d
      var i = 0
      while (i < n) {
        acc += v.getDouble(i) * w(j, i).toDouble
        i += 1
      }
      if (acc > 0.0d) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** `graft_doc_pairs(array<struct<doc_id:bigint, sz:bigint>>)`: all
  * unordered pairs from one posting list, each emitted once with
  * `doc_a < doc_b` — the pair-expansion step of an inverted-index
  * near-dup search, run as one native pass per list instead of a
  * self-join that recomputes and broadcasts the whole posting table.
  * Output order is id-sorted per pair and the downstream aggregation is
  * pair-keyed, so the (nondeterministic) collect_list order upstream
  * cannot affect results.
  */
case class DocPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("sz_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("sz_b", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_doc_pairs"

  override protected def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val szs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0)
      szs(i) = row.getLong(1)
      i += 1
    }
    // Long arithmetic: n ≈ 46k already overflows Int in n*(n-1)/2. A
    // list that big means a stop-shingle slipped through — fail with
    // the cause rather than a NegativeArraySizeException.
    val nPairs = n.toLong * (n - 1) / 2
    if (nPairs > Int.MaxValue)
      throw new IllegalStateException(
        s"graft_doc_pairs: posting list of $n docs expands to $nPairs " +
          "pairs; filter hot shingles (document-frequency cap) before " +
          "pair expansion")
    val out = new Array[Any](nPairs.toInt)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val (a, b) = if (ids(i) < ids(j)) (i, j) else (j, i)
        out(k) = new GenericInternalRow(
          Array[Any](ids(a), szs(a), ids(b), szs(b))): InternalRow
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): DocPairs =
    copy(child = newChild)
}

/** `graft_token_pairs(toks)`: all index-ordered pairs (toks[i],
  * toks[j]) with i < j from one token array, as
  * `array<struct<tok_a, tok_b>>` — the map-side pair expansion of the
  * co-occurrence operator, run as one native pass instead of nested
  * interpreted `transform` lambdas (measured: the lambda form burned
  * ~0.8 s of single-task CPU per execution at sf0.1). Callers pass a
  * SORTED distinct array, so i < j ⇔ tok_a < tok_b — identical pairs
  * to the oracle's `a.tok < b.tok` self-join.
  */
case class TokenPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tok_a", StringType, nullable = false),
    StructField("tok_b", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_token_pairs"

  override protected def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val nPairs = n.toLong * (n - 1) / 2
    if (nPairs > Int.MaxValue)
      throw new IllegalStateException(
        s"graft_token_pairs: $n tokens expand to $nPairs pairs; gate " +
          "the vocabulary before pair expansion")
    val out = new Array[Any](nPairs.toInt)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(
          Array[Any](toks(i), toks(j))): InternalRow
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenPairs =
    copy(child = newChild)
}

/** `graft_json_valid(s)`: true iff `s` parses as ONE strict JSON
  * document (single root value, no trailing content) — the
  * error-vs-empty discriminator behind JSON_VALUE's ON ERROR clause,
  * which `get_json_object` alone cannot express (it returns NULL for a
  * missing path AND for malformed JSON). Jackson — Spark's own JSON
  * dependency, the parser inside `get_json_object` — does the parse,
  * so validity agrees with the extractor's notion of parseable.
  */
case class JsonIsValid(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_json_valid expects string, got ${child.dataType.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_json_valid"

  override protected def nullSafeEval(input: Any): Any =
    JsonIsValid.valid(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(newChild: Expression): JsonIsValid =
    copy(child = newChild)
}

object JsonIsValid {
  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    // one root value only: '{} trailing' is invalid JSON, and Jackson
    // otherwise accepts multiple whitespace-separated roots
    m.enable(com.fasterxml.jackson.databind.DeserializationFeature
      .FAIL_ON_TRAILING_TOKENS)
    m
  }
  def valid(s: String): Boolean =
    try {
      val t = mapper.readTree(s)
      // readTree returns MissingNode (no exception) for empty input
      t != null && !t.isMissingNode
    } catch {
      case _: com.fasterxml.jackson.core.JacksonException => false
    }
}

/** `graft_json_items(json, path)`: the SQL:2016 item SEQUENCE of a
  * multi-value JSON path as an array of canonical JSON texts — the
  * evaluator behind JSON_QUERY/JSON_EXISTS behavior clauses on
  * recursive-descent (`$..name`) and multi-wildcard (`$.a[*].b[*]`)
  * paths, which Spark's variant path grammar (field/index steps only)
  * cannot express. Supported steps after `$`: `.name` / `['name']`
  * member, `[n]` index, `[*]` wildcard (array → elements, anything
  * else → the lax singleton wrap — the engine's oracle-pinned r15
  * law), `.*` member wildcard (object → field values in document
  * order, array → elements, scalar → nothing), and `..name` deep scan
  * (jayway order: a node's own matching member collects before the
  * recursion into its children — collected subtrees are re-scanned,
  * so a `name` nested inside a `name` yields both). Member steps over
  * a multi-item stage lax-skip items lacking the member and do NOT
  * auto-unwrap nested arrays (the r15 spec-pinned choice). Returns
  * SQL NULL for malformed input (same strict-parse law as
  * [[JsonIsValid]]); missing paths yield an EMPTY array, never NULL.
  */
case class JsonPathItems(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_json_items expects (string json, string path), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_json_items"

  // the path is a validated literal in all generated SQL: parse it
  // once per query, not once per row (the per-row fallback serves a
  // hand-written non-foldable path argument)
  @transient private lazy val foldableSteps
      : Option[Seq[JsonPathItems.Step]] =
    if (right.foldable)
      Option(right.eval(null))
        .map(p => JsonPathItems.parse(p.asInstanceOf[UTF8String]))
    else None

  override protected def nullSafeEval(json: Any, path: Any): Any = {
    val steps = foldableSteps.getOrElse(
      JsonPathItems.parse(path.asInstanceOf[UTF8String]))
    val root =
      try {
        val t = JsonPathItems.mapper.readTree(
          json.asInstanceOf[UTF8String].toString)
        if (t == null || t.isMissingNode) null else t
      } catch {
        case _: com.fasterxml.jackson.core.JacksonException => null
      }
    if (root == null) null
    else new GenericArrayData(JsonPathItems.items(root, steps)
      .map(n => UTF8String.fromString(n.toString)).toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonPathItems =
    copy(left = newLeft, right = newRight)
}

object JsonPathItems {
  import com.fasterxml.jackson.databind.JsonNode
  import scala.jdk.CollectionConverters._

  /** [[parsePath]] with the expression's contract error on a path
    * outside the grammar. */
  private[functions] def parse(path: UTF8String): Seq[Step] =
    parsePath(path.toString).getOrElse(
      throw new IllegalArgumentException(
        s"graft_json_items: unsupported path $path (steps: .name, " +
          "['name'], [n], [*], .*, ..name)"))

  private[functions] val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.enable(com.fasterxml.jackson.databind.DeserializationFeature
      .FAIL_ON_TRAILING_TOKENS)
    m
  }

  sealed trait Step
  final case class Member(name: String) extends Step
  final case class Deep(name: String) extends Step
  final case class Index(i: Int) extends Step
  case object Wild extends Step
  case object MemberWild extends Step

  /** Parses the supported multi-value path grammar; `None` marks a
    * form outside it (the caller keeps its legacy behavior there).
    * Shared with the dialect rewrite, which validates the LITERAL
    * path at rewrite time so unsupported forms reject by name before
    * any execution.
    */
  def parsePath(p: String): Option[Seq[Step]] = {
    val s = p.trim
    if (!s.startsWith("$")) return None
    val steps = scala.collection.mutable.ArrayBuffer.empty[Step]
    var i = 1
    def ident(from: Int): Option[(String, Int)] = {
      var j = from
      while (j < s.length &&
        (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j += 1
      if (j == from) None else Some((s.substring(from, j), j))
    }
    while (i < s.length) {
      s.charAt(i) match {
        case '.' if i + 1 < s.length && s.charAt(i + 1) == '.' =>
          ident(i + 2) match {
            case Some((n, j)) => steps += Deep(n); i = j
            case None => return None
          }
        case '.' if i + 1 < s.length && s.charAt(i + 1) == '*' =>
          steps += MemberWild; i += 2
        case '.' =>
          ident(i + 1) match {
            case Some((n, j)) => steps += Member(n); i = j
            case None => return None
          }
        case '[' =>
          val close = s.indexOf(']', i)
          if (close < 0) return None
          val body = s.substring(i + 1, close).trim
          if (body == "*") steps += Wild
          else if (body.length >= 2 &&
              (body.head == '\'' || body.head == '"') &&
              body.last == body.head)
            steps += Member(body.substring(1, body.length - 1))
          else if (body.nonEmpty && body.forall(_.isDigit))
            // length-bounded so an over-Int index falls to None (the
            // caller's named rejection) instead of a NumberFormat crash
            body.toIntOption match {
              case Some(ix) => steps += Index(ix)
              case None => return None
            }
          else return None
          i = close + 1
        case c if c.isWhitespace => i += 1
        case _ => return None
      }
    }
    if (steps.isEmpty) None else Some(steps.toSeq)
  }

  /** One stage of the walk per step over the current item list. */
  private[functions] def items(root: JsonNode,
      steps: Seq[Step]): Seq[JsonNode] =
    steps.foldLeft(Seq(root)) { (cur, step) =>
      step match {
        case Member(n) => cur.flatMap(nd =>
          if (nd.isObject && nd.has(n)) Some(nd.get(n)) else None)
        case Index(k) => cur.flatMap(nd =>
          if (nd.isArray && k < nd.size) Some(nd.get(k)) else None)
        case Wild => cur.flatMap(nd =>
          if (nd.isArray) nd.elements.asScala.toSeq else Seq(nd))
        case MemberWild => cur.flatMap(nd =>
          if (nd.isObject)
            nd.fields.asScala.map(_.getValue).toSeq
          else if (nd.isArray) nd.elements.asScala.toSeq
          else Nil)
        case Deep(n) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[JsonNode]
          def rec(nd: JsonNode): Unit =
            if (nd.isObject) {
              // a node's own matching member collects BEFORE the
              // recursion (jayway's scan order), and the recursion
              // enters the collected value too
              if (nd.has(n)) out += nd.get(n)
              nd.fields.asScala.foreach(e => rec(e.getValue))
            } else if (nd.isArray) nd.elements.asScala.foreach(rec)
          cur.foreach(rec)
          out.toSeq
      }
    }
}

/** Registration: temp functions on a session (for library use) and a
  * `SparkSessionExtensions` hook (for `spark.sql.extensions` wiring).
  */
object GraftFunctions {
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_poly_hash" -> (es => PolyHash(es.head)),
    "graft_poly_hash2" -> (es => PolyHash2(es.head)),
    "graft_minhash_sig" -> (es => MinHashSig(es.head)),
    "graft_simhash" -> (es => SimHash(es.head)),
    "graft_shingle_hashes" -> (es => ShingleHashes(es.head, es(1))),
    "graft_word_ngrams" -> (es => WordNgrams(es.head, es(1))),
    "graft_dot" -> (es => DotProduct(es.head, es(1))),
    "graft_l2_normalize" -> (es => L2Normalize(es.head)),
    "graft_doc_pairs" -> (es => DocPairs(es.head)),
    "graft_capped_postings" -> (es => CappedPostingsAgg(es.head, es(1), es(2))),
    "graft_topk_by_score" -> (es => TopKByScoreAgg(es.head, es(1), es(2))),
    "graft_token_pairs" -> (es => TokenPairs(es.head)),
    "graft_json_valid" -> (es => JsonIsValid(es.head)),
    "graft_json_items" -> (es => JsonPathItems(es.head, es(1))),
    "graft_lsh_bucket" -> { es =>
      if (es.size > 2) throw new IllegalArgumentException(
        s"graft_lsh_bucket takes (vector[, planes]), got ${es.size} arguments")
      LshBucket(es.head,
        if (es.size > 1) es(1)
        else org.apache.spark.sql.catalyst.expressions.Literal(LshBucket.Planes))
    })

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
    GraftMetrics.ensureListener(spark)
  }
}

/** `spark.sql.extensions=graft.functions.GraftSparkExtensions` registers
  * the functions at session build time on every session of the cluster.
  */
class GraftSparkExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    ext.injectResolutionRule(_ => graft.plans.StreamingApproxDistinct())
    ext.injectResolutionRule(_ => graft.plans.StreamingTopOneDedup())
  }
}
