package graft.harness.ddl

/** Parsed form of a Flink-style `CREATE TABLE ... WITH ('connector'=...)`
  * statement — the DDL surface the harness must understand beyond
  * first-keyword classification (SURVEY.md §7 step 3).
  */
final case class ColumnDef(name: String, dataType: String)

/** `name AS expr` computed column (test.sql:18). */
final case class ComputedColumnDef(name: String, expr: String)

/** `name TYPE METADATA [FROM 'key'] [VIRTUAL]` — a connector-provided
  * column. `key` defaults to the column name; VIRTUAL (read-only,
  * excluded from the insert schema) is recorded but source-side
  * metadata is read-only here anyway.
  */
final case class MetadataColumnDef(
    name: String, dataType: String, key: String, virtual: Boolean)

/** `WATERMARK FOR col AS col - INTERVAL 'n' SECOND` (test.sql:19).
  * `delay` is the Spark `withWatermark` delay string, e.g. "5 seconds".
  */
final case class WatermarkDef(column: String, delay: String)

/** `LIKE src (merge options)` clause: the referenced table plus the
  * (strategy, feature) merge directives in declaration order —
  * e.g. `(EXCLUDING OPTIONS, OVERWRITING WATERMARKS)`.
  */
final case class LikeClause(table: String, opts: Vector[(String, String)])

final case class TableDef(
    name: String,
    ifNotExists: Boolean,
    columns: Vector[ColumnDef],
    computedColumns: Vector[ComputedColumnDef],
    watermark: Option[WatermarkDef],
    options: Map[String, String],
    partitionedBy: Vector[String] = Vector.empty,
    primaryKey: Vector[String] = Vector.empty,
    like: Option[LikeClause] = None,
    metadataColumns: Vector[MetadataColumnDef] = Vector.empty) {
  def connector: Option[String] = options.get("connector")
}
