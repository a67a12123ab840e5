package graft.model

/** Config-surface model for the configurable ETL engine.
  *
  * Mirrors the reference's Excel control plane (SURVEY.md §1.1, §3.1):
  * a study configuration lists analytes; each analyte has a GET_DATA
  * sheet (source loads) and a DF_OPERATIONS sheet (ordered operator
  * rows). Reference: /root/reference/Configurable_ETL_Python.py:606-612
  * (config readers), :434-454 (get_data), :456-522 (dispatcher).
  *
  * These are plain case classes so pipeline specs can be authored in
  * code, parsed from CSV/JSON, or generated — the engine itself only
  * sees this model.
  */

/** One sort key; `desc` = descending. Pandas puts NaN last in both
  * directions (Configurable_ETL_Python.py:76-91), so compilation to
  * Spark must force nulls-last explicitly (Spark default asc = nulls
  * first).
  */
final case class SortKey(col: String, desc: Boolean = false)

/** Where a GET_DATA row loads from. */
sealed trait SourceKind
object SourceKind {
  /** Keyed scan of the nested store on (study_code, view) —
    * Configurable_ETL_Python.py:30-41. In the Spark engine this is a
    * partition-pruned parquet read + explode of the `data` array.
    */
  final case class StoreView(studyCode: String, view: String) extends SourceKind
  /** A previously-derived analyte resolved from the engine catalog —
    * Configurable_ETL_Python.py:319-321,442-444 (memoization).
    */
  case object AnalyteRef extends SourceKind
  /** A named parquet table under the scale-factor directory (our
    * test harness / lakehouse layout).
    */
  final case class ParquetTable(name: String) extends SourceKind
}

/** One GET_DATA row: load, optionally filter (condition mini-language
  * string), project a column list (tolerant — missing columns skip the
  * projection, Configurable_ETL_Python.py:43-53), optionally distinct.
  * Result is bound to `objectName` in the pipeline catalog.
  */
final case class GetDataSpec(
    objectName: String,
    source: SourceKind,
    columns: Seq[String] = Nil,
    filter: Option[String] = None,
    distinct: Boolean = false)

/** One DF_OPERATIONS row: apply `opType` to the named input `frames`,
  * parameterized by the `condition` grammar string, and bind the
  * result to `objectName` (Configurable_ETL_Python.py:456-522).
  */
final case class OperationSpec(
    objectName: String,
    opType: String,
    frames: Seq[String],
    condition: String = "")

/** A decision (lookup) table: 2-column `lookupValue -> output`
  * worksheet (Configurable_ETL_Python.py:380-398,610-612). Kept as
  * data, not code: compiled to a broadcast join or a when-chain.
  */
final case class DecisionTable(name: String, mapping: Seq[(String, String)])

/** One analyte: its GET_DATA rows, its ordered operations, and the
  * decision tables its DECISION COLUMN ops reference.
  */
final case class AnalyteSpec(
    name: String,
    getData: Seq[GetDataSpec],
    operations: Seq[OperationSpec],
    decisionTables: Map[String, DecisionTable] = Map.empty)

/** The study configuration: ordered analytes (first seeds the
  * per-subject accumulator, Configurable_ETL_Python.py:595-597), the
  * join key for stitching (`subject` in the reference, :600).
  */
final case class StudySpec(
    studyCode: String,
    analytes: Seq[AnalyteSpec],
    stitchKey: String = "subject")

/** Operator-type names accepted by the interpreter — one per
  * DF_OPERATIONS `Operation Type` value observed in the reference
  * dispatcher (Configurable_ETL_Python.py:456-522).
  */
object OpType {
  val RenameColumn = "RENAME COLUMN"
  val FormatColumn = "FORMAT COLUMN"
  val Filter = "FILTER"
  val LeftJoin = "LEFT JOIN"
  val OuterJoin = "OUTER JOIN"
  val QualifiedJoin = "QUALIFIED JOIN" // general form, Configurable_ETL_Python.py:250-264
  val AggregateColumn = "AGGREGATE COLUMN"
  val RemoveColumn = "REMOVE COLUMN"
  val UniqueColumn = "UNIQUE COLUMN"
  val AddColumn = "ADD COLUMN"
  val BindRows = "BIND ROWS"
  val SortDataset = "SORT DATASET"
  val GroupbySummarise = "GROUPBY SUMMARISE"
  val RemoveRows = "REMOVE ROWS"
  val DecisionColumn = "DECISION COLUMN"
  val SelectColumns = "SELECT COLUMNS"
  val SelectDistinct = "SELECT DISTINCT"
  val AttachColumn = "ATTACH COLUMN"
  val GroupbySlice = "GROUPBY SLICE"
}
