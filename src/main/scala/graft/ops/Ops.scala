package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.model.SortKey
import graft.parse.Conditions
import graft.parse.Conditions._

/** Compile parsed condition ASTs to Catalyst Columns. Kept separate
  * from the pure parser so the parser stays ScalaCheck-able without a
  * SparkSession.
  */
object Compile {
  def lit2col(l: Lit): Column = l match {
    case SLit(v) => lit(v)
    case NLit(v) => lit(v)
    // DATE(yyyy-mm-dd) compares against datetime columns in the
    // reference (pd.to_datetime) → timestamp at midnight.
    case DLit(v) => lit(java.sql.Timestamp.valueOf(v.atStartOfDay()))
    case BLit(v) => lit(v)
  }

  def cond2col(c: Cond): Column = c match {
    case Cmp(col_, "=", l) => col(col_) === lit2col(l)
    case Cmp(col_, ">=", l) => col(col_) >= lit2col(l)
    case Cmp(col_, "<=", l) => col(col_) <= lit2col(l)
    case Cmp(col_, op, _) => throw ParseError(s"unknown op '$op' on $col_")
    case NotNull(col_) => col(col_).isNotNull
    case And(a, b) => cond2col(a) && cond2col(b)
    case Or(a, b) => cond2col(a) || cond2col(b)
    case Between(col_, lo, hi) => col(col_).between(lit2col(lo), lit2col(hi))
  }

  /** Parse + compile a condition string. */
  def filterColumn(s: String): Column = cond2col(Conditions.parse(s))
}

/** One function per SURVEY.md §2 operator, each a pure
  * `DataFrame => DataFrame` built ONLY from
  * `org.apache.spark.sql.functions` — no UDFs, no collect, so every
  * op stays inside whole-stage codegen and scales with partitioning.
  *
  * Order-dependent ops (uniqueColumns, groupbySummarise `last`,
  * groupbySlice) take an explicit `order: Seq[SortKey]` threaded by
  * the interpreter — Spark discards the implicit row order pandas
  * preserves (SURVEY.md §4), so the ordering a preceding SORT DATASET
  * established is compiled into a window specification instead.
  */
object Ops {

  /** strftime → java.time.DateTimeFormatter pattern translation
    * (SURVEY.md §2.6 C2). Tokenizes left-to-right so `%%` escapes are
    * seen before directive rules, and single-quotes literal text
    * containing letters so DateTimeFormatter doesn't read it as
    * pattern chars. Unknown directives fail loudly — and so do
    * separator-less adjacent directives that would MERGE into one
    * field (`%y%Y` → `yyyyyy`, a single 6-digit year instead of two
    * fields; found by the generative OpsSpec property): Java has no
    * empty separator (`''` renders a literal quote), so no faithful
    * translation exists and silently emitting the merged field would
    * format/parse wrong values.
    */
  def strftimeToJava(fmt: String): String = {
    val table = Map(
      'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
      'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss",
      'f' -> "SSSSSS", 'p' -> "a", 'j' -> "DDD")
    val out = new StringBuilder
    val litBuf = new StringBuilder
    def flush(): Unit = if (litBuf.nonEmpty) {
      val s = litBuf.toString
      // letters must be quoted (reserved as pattern fields), and so
      // must ANY literal containing a quote: the bare `''` escape only
      // works in isolation — two adjacent escapes (`''''` from a
      // literal `''`) parse as open + escaped + close, i.e. ONE quote
      // (found by the generative strftime property, round 14). Inside
      // a quoted section each doubled quote is unambiguous.
      if (s.exists(_.isLetter) || s.contains("'"))
        out.append('\'').append(s.replace("'", "''")).append('\'')
      else out.append(s)
      litBuf.clear()
    }
    var i = 0
    while (i < fmt.length) {
      if (fmt(i) == '%' && i + 1 < fmt.length) {
        fmt(i + 1) match {
          case '%' => litBuf.append('%')
          case d => table.get(d) match {
            case Some(j) =>
              flush()
              if (out.nonEmpty && out.last == j.head)
                throw new IllegalArgumentException(
                  s"adjacent strftime directives merge into one field around '%$d' in " +
                    s"'$fmt' ('${out.takeRight(2)}$j') — insert a separator")
              out.append(j)
            case None => throw new IllegalArgumentException(
              s"untranslated strftime directive '%$d' in '$fmt'")
          }
        }
        i += 2
      } else {
        require(fmt(i) != '%', s"dangling '%' at end of '$fmt'")
        litBuf.append(fmt(i)); i += 1
      }
    }
    flush()
    out.toString
  }

  /** The single SortKey→Column mapping — pandas sorts NaN last in
    * BOTH directions (R2), so force nulls_last. Shared with the engine
    * (PipelineContext.result, StudyRunner.run) so the nulls-last
    * parity invariant lives in exactly one place.
    */
  private[graft] def sortCols(order: Seq[SortKey]): Seq[Column] =
    order.map(k => if (k.desc) col(k.col).desc_nulls_last else col(k.col).asc_nulls_last)

  /** Deterministic tie-break appended to order-consuming windows: a
    * content hash over every column. Rows tied on the declared sort
    * keys then resolve identically on every run and cluster layout
    * (content-based, not partition-based) — pandas' stable sort keeps
    * prior FILE order instead, which is not reconstructable after a
    * shuffle; the divergence is deliberate (SURVEY §4.1) and only
    * observable when a config under-specifies its sort. Rows identical
    * in every column are interchangeable, so output stays exact.
    * Columns containing MapType anywhere in their type are excluded
    * (Spark's hash functions reject maps recursively); an all-map
    * frame degenerates to a constant, i.e. the pre-tiebreak behavior.
    */
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => true
    case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => containsMap(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
    case _ => false
  }

  private def rowHash(df: DataFrame): Column = {
    val hashable = df.schema.fields.collect {
      case f if !containsMap(f.dataType) => col(f.name)
    }.toSeq
    if (hashable.isEmpty) lit(0L) else xxhash64(hashable: _*)
  }

  /** pandas groupby(dropna=True) "missing" test for one group key:
    * pandas drops NaN keys the same as None, but Spark's isNotNull
    * keeps NaN — float keys need the extra isnan leg.
    */
  private def groupKeyPresent(df: DataFrame)(c: String): Column = {
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    df.schema(c).dataType match {
      case DoubleType | FloatType => col(c).isNotNull && !isnan(col(c))
      case _ => col(c).isNotNull
    }
  }

  // ===== §2.2 projection / distinct =====

  /** P1 `columns_selection`: tolerant projection — if ANY requested
    * column is missing the whole projection is silently skipped
    * (KeyError → pass, Configurable_ETL_Python.py:43-53).
    */
  def selectColumnsTolerant(cols: Seq[String], distinct: Boolean)(df: DataFrame): DataFrame = {
    val have = df.columns.toSet
    if (cols.nonEmpty && cols.forall(have.contains)) {
      val p = df.select(cols.map(col): _*)
      if (distinct) p.dropDuplicates(cols) else p
    } else df
  }

  /** P2 SELECT COLUMNS: strict projection. */
  def selectColumns(cols: Seq[String])(df: DataFrame): DataFrame =
    df.select(cols.map(col): _*)

  /** P3 SELECT DISTINCT: project then dedup — row set identical to
    * pandas' keep-first since the output has exactly the dedup cols.
    */
  def selectDistinct(cols: Seq[String])(df: DataFrame): DataFrame =
    df.select(cols.map(col): _*).dropDuplicates()

  /** P4 UNIQUE COLUMN: dedup on `cols` keeping all other columns.
    * Pandas keeps the FIRST row in current order; with an established
    * order we compile to row_number()==1, else Spark's arbitrary-row
    * dropDuplicates (set-equivalent when no order was declared).
    */
  def uniqueColumns(cols: Seq[String], order: Seq[SortKey])(df: DataFrame): DataFrame =
    if (order.isEmpty) df.dropDuplicates(cols)
    else {
      require(!df.columns.contains("__rn"),
        "uniqueColumns: input already has a column named __rn (reserved " +
          "for the internal keep-first rank) — rename it first")
      val w = Window.partitionBy(cols.map(col): _*)
        .orderBy(sortCols(order) :+ rowHash(df).asc: _*)
      df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
    }

  /** P5 REMOVE COLUMN. Strict like the reference: pandas df.drop
    * (axis='columns', default errors='raise') raises KeyError on a
    * missing column (Configurable_ETL_Python.py:286-289) — a typo'd
    * config fails loudly instead of silently no-op'ing.
    */
  def removeColumns(cols: Seq[String])(df: DataFrame): DataFrame = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"REMOVE COLUMN: no such column(s) ${missing.mkString(", ")} " +
        s"(have: ${df.columns.mkString(", ")})")
    df.drop(cols: _*)
  }

  // ===== §2.3 filter =====

  /** F1-F5: the condition mini-language. */
  def filterOp(condition: String)(df: DataFrame): DataFrame =
    df.filter(Compile.filterColumn(condition))

  // ===== §2.4 joins =====

  /** J1/J2 `any_join`: equi-join on same-named key columns. Pandas
    * suffixes overlapping non-key columns `_x`/`_y`
    * (Configurable_ETL_Python.py:531-534); we rename deterministically
    * BEFORE the join so the plan stays total and unambiguous.
    */
  def namedJoin(left: DataFrame, right: DataFrame, keys: Seq[String], how: String): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet) -- keys.toSet
    val l = overlap.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"${c}_x"))
    val r = overlap.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"${c}_y"))
    l.join(r, keys, how)
  }

  /** J3 `joining_columns`: general qualified form
    * `df1.a = df2.b & …` with an explicit how.
    */
  def qualifiedJoin(
      left: DataFrame,
      right: DataFrame,
      pairs: Seq[(String, String)],
      how: String): DataFrame = {
    val cond = pairs.map { case (a, b) => left(a) === right(b) }.reduce(_ && _)
    left.join(right, cond, how)
  }

  // ===== §2.5 aggregation =====

  /** A1 GROUPBY SUMMARISE: `group_by_cols=a,b | summary_col_ops=c#fn`.
    * Supported fns: min,max,sum,mean,count,first,last. `first`/`last`
    * are ORDER-DEPENDENT in pandas ("first/last in current row
    * order") — compiled to min_by/max_by over the established sort
    * key so the plan is deterministic (never bare first()/last()).
    */
  def groupbySummarise(
      groupCols: Seq[String],
      aggs: Seq[(String, String)],
      order: Seq[SortKey])(df: DataFrame): DataFrame = {
    // For first/last we need a single ASCENDING-orderable expression.
    // All-ascending sorts compile to a struct: struct ordering is
    // lexicographic, matching pandas' multi-key sort_values, with each
    // key paired with an isNull flag (false < true) so a null key
    // ranks AFTER every non-null one — pandas puts NaN last
    // (na_position default), but a bare null struct field would sort
    // first. Sorts with any descending key are not struct-encodable
    // (no generic negation exists), so those rank rows once with a
    // row_number window over the exact sort (sortCols is nulls-last in
    // BOTH directions, like pandas) — the window partitions on the
    // group keys, so the aggregation reuses its hash partitioning and
    // Catalyst plans no second exchange. The content-hash tiebreak
    // makes ties on the sort keys resolve deterministically (see
    // rowHash) — rows tied AND equal in the aggregated column give the
    // same value either way, so it only affects genuinely
    // under-specified configs.
    // the reference builds a dict keyed by column (res_dct[c] = fn,
    // Configurable_ETL_Python.py:351), so a repeated column keeps its
    // FIRST position with its LAST fn — and only the EFFECTIVE fns
    // decide whether an order is required: 'c#first, c#sum' runs
    // order-free in pandas because the dict keeps only {c: sum}
    val effective = aggs.map(_._1).distinct.map(c => c -> aggs.filter(_._1 == c).last._2)
    val needsFirstLast =
      effective.exists(a => Set("first", "last").contains(a._2.toLowerCase))
    // pandas groupby defaults to dropna=True: rows with ANY null group
    // key are excluded from the aggregation, not emitted as a
    // null-keyed group (reference :356 uses the default)
    val keyed = df.where(groupCols.map(groupKeyPresent(df)).reduce(_ && _))
    val (src, orderKeyOpt): (DataFrame, Option[Column]) =
      if (!needsFirstLast) (keyed, None)
      else order match {
        case Nil => throw new IllegalStateException(
          "GROUPBY SUMMARISE first/last requires a preceding SORT DATASET")
        case o if o.forall(!_.desc) =>
          (keyed, Some(struct(o.flatMap(k =>
            Seq(col(k.col).isNull, col(k.col))) :+ rowHash(df): _*)))
        case o =>
          // internal-column clash guard (the chunkBinary discipline):
          // withColumn would silently REPLACE a caller's __gs_rn and
          // any agg on it would aggregate the internal rank
          require(!df.columns.contains("__gs_rn"),
            "groupbySummarise: input already has a column named __gs_rn " +
              "(reserved for the descending first/last rank) — rename it first")
          val w = Window.partitionBy(groupCols.map(col): _*)
            .orderBy(sortCols(o) :+ rowHash(df).asc: _*)
          (keyed.withColumn("__gs_rn", row_number().over(w)), Some(col("__gs_rn")))
      }
    def orderExpr: Column = orderKeyOpt.get
    val aggCols = effective.map { case (c, fn) =>
      (fn.toLowerCase match {
        case "min" => min(col(c))
        case "max" => max(col(c))
        // pandas .agg('sum') uses min_count=0: an all-null group sums
        // to 0, not null (same rule attachSumEq codifies, SURVEY D4)
        case "sum" => coalesce(sum(col(c)), lit(0))
        case "mean" | "avg" => avg(col(c))
        case "count" => count(col(c))
        // pandas .agg('last') = last NON-NULL value in sort order
        // (GroupBy.last skips nulls). Null-guard the VALUE so
        // max_by/min_by skip rows whose value is null: max_by ignores
        // null ordering keys, so the result is the value at the
        // greatest order key among non-null values — exactly pandas.
        // All-null group → null, also matching pandas. Both encodings
        // above are ascending-in-sort-order, so no direction flip.
        case "last" => max_by(col(c), when(col(c).isNotNull, orderExpr))
        case "first" => min_by(col(c), when(col(c).isNotNull, orderExpr))
        case other => throw new IllegalArgumentException(s"unknown summarise fn '$other'")
      }).as(c)
    }
    src.groupBy(groupCols.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
  }

  /** A2 AGGREGATE COLUMN: row-wise min/max across a `#`-separated
    * column list; NaN/null skipped — exactly `least`/`greatest`.
    */
  def aggregateColumn(newCol: String, srcCols: Seq[String], fn: String)(df: DataFrame): DataFrame = {
    require(srcCols.nonEmpty, "AGGREGATE COLUMN needs at least one source column")
    // pandas df[cols].min(axis=1) accepts a single column (identity);
    // Spark's least/greatest demand two args — special-case it, don't
    // throw WRONG_NUM_ARGS at a config the reference runs fine
    val c = fn.toLowerCase match {
      case "min" | "max" if srcCols.size == 1 => col(srcCols.head)
      case "min" => least(srcCols.map(col): _*)
      case "max" => greatest(srcCols.map(col): _*)
      case other => throw new IllegalArgumentException(s"unknown row-wise fn '$other'")
    }
    df.withColumn(newCol, c)
  }

  /** A3 GROUPBY SLICE: first n rows per group in the established
    * order — top-k per group via row_number. Requires the interpreter
    * to thread the ordering of the preceding SORT DATASET.
    */
  def groupbySlice(groupCols: Seq[String], n: Int, order: Seq[SortKey])(df: DataFrame): DataFrame = {
    require(order.nonEmpty, "GROUPBY SLICE requires a preceding SORT DATASET")
    require(!df.columns.contains("__rn"),
      "groupbySlice: input already has a column named __rn (reserved " +
        "for the internal slice rank) — rename it first")
    // pandas groupby defaults to dropna=True (reference :73): rows
    // with a null group key are excluded, not sliced as a null group
    val keyed = df.where(groupCols.map(groupKeyPresent(df)).reduce(_ && _))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(sortCols(order) :+ rowHash(df).asc: _*)
    keyed.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= n).drop("__rn")
  }

  /** A5 rollup/cube summarise (beyond-reference OLAP surface): the
    * same fn table as GROUPBY SUMMARISE over Spark's native
    * rollup/cube grouping sets, with `grouping_id` emitted so
    * subtotal rows (keys NULLed by the grouping set) are
    * distinguishable from genuine null keys. Partial aggregation
    * applies per grouping set exactly as for a flat groupBy — the
    * shuffle key is the grouping-set tuple.
    */
  def groupbyRollup(
      groupCols: Seq[String],
      aggs: Seq[(String, String, String)], // (src, fn, out)
      cube: Boolean = false)(df: DataFrame): DataFrame = {
    val exprs = aggs.map {
      case (src, "sum", out) => sum(col(src)).as(out)
      case (src, "min", out) => min(col(src)).as(out)
      case (src, "max", out) => max(col(src)).as(out)
      case (src, "mean", out) => avg(col(src)).as(out)
      case (src, "count", out) => count(col(src)).as(out)
      case (_, other, _) => throw new IllegalArgumentException(s"unknown rollup fn '$other'")
    }
    val grouped = if (cube) df.cube(groupCols.map(col): _*) else df.rollup(groupCols.map(col): _*)
    val all = exprs :+ grouping_id().cast("int").as("grouping_id")
    grouped.agg(all.head, all.tail: _*)
      .select((groupCols.map(col) :+ col("grouping_id")) ++ aggs.map(a => col(a._3)): _*)
  }

  /** Pivot: one output column per `nameCol` value (explicit value
    * list — at 100 TB an implicit-values pivot would need a distinct
    * pass AND make the output schema data-dependent), aggregated with
    * `fn`. Compiles to one partial-aggregated shuffle on the group
    * keys; each pivot cell is a filtered aggregate.
    */
  def pivotAgg(
      groupCols: Seq[String],
      nameCol: String,
      valCol: String,
      names: Seq[String],
      fn: String = "sum")(df: DataFrame): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .pivot(nameCol, names)
      .agg(fn match {
        case "sum" => sum(col(valCol))
        case "min" => min(col(valCol))
        case "max" => max(col(valCol))
        case "mean" => avg(col(valCol))
        case "count" => count(col(valCol))
        case other => throw new IllegalArgumentException(s"unknown pivot fn '$other'")
      })

  /** Unpivot/melt: the inverse reshape, Spark-native (no UDF, no
    * explode of hand-built structs). Null cells are kept so
    * pivot→unpivot round-trips sparse data.
    */
  def unpivot(
      idCols: Seq[String],
      valueCols: Seq[String],
      nameCol: String = "name",
      valCol: String = "value")(df: DataFrame): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray, nameCol, valCol)

  // ===== §2.6 column derivation =====

  /** C1 RENAME COLUMN: `old = new` pairs, applied SIMULTANEOUSLY like
    * pandas df.rename(columns=dict) — a sequential withColumnRenamed
    * fold would corrupt swaps ('a=b, b=a' leaves two columns named
    * 'a') and silently duplicate on rename-onto-existing. A repeated
    * old name keeps its LAST mapping (dict construction order);
    * missing old names are ignored (pandas default). A mapping that
    * WOULD produce duplicate names fails loudly — pandas allows
    * duplicate labels, Spark would defer the failure to the first
    * ambiguous reference downstream with a far worse message.
    */
  def renameColumns(pairs: Seq[(String, String)])(df: DataFrame): DataFrame = {
    val m = pairs.toMap
    val newNames = df.columns.map(c => m.getOrElse(c, c)).toSeq
    require(newNames.distinct.length == newNames.length,
      "RENAME COLUMN produces duplicate column names: " +
        newNames.diff(newNames.distinct).distinct.mkString(", "))
    df.toDF(newNames: _*)
  }

  /** C2 FORMAT COLUMN: `column=c, type=datetime#<strftime>` or
    * `type=number`.
    *
    * datetime is LENIENT like pd.to_datetime: an already-timestamp
    * column passes through unchanged, and values that don't match the
    * given pattern fall back to the default timestamp cast (the
    * all_ipdc_date config unions a string-dated frame with a
    * timestamp-dated one before formatting — union coercion turns the
    * timestamps into 'yyyy-MM-dd HH:mm:ss' strings the %Y-%m-%d
    * pattern alone would reject, and ANSI to_timestamp would throw).
    */
  def formatColumn(c: String, typeSpec: String)(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.TimestampType
    val parts = typeSpec.split("#", 2)
    parts(0).trim.toLowerCase match {
      case "datetime" =>
        if (df.schema(c).dataType == TimestampType) df
        else {
          val fmt = strftimeToJava(parts(1).trim)
          df.withColumn(c,
            coalesce(try_to_timestamp(col(c), lit(fmt)), col(c).try_cast("timestamp")))
        }
      case "number" =>
        df.withColumn(c, col(c).cast("double"))
      case other => throw new IllegalArgumentException(s"unknown format type '$other'")
    }
  }

  /** C3 ADD COLUMN: constant string column. */
  def addColumn(name: String, value: String)(df: DataFrame): DataFrame =
    df.withColumn(name, lit(value))

  /** C4 ATTACH COLUMN / NOTNULL: boolean `src IS NOT NULL`. */
  def attachNotNull(name: String, src: String)(df: DataFrame): DataFrame =
    df.withColumn(name, col(src).isNotNull)

  /** C5 ATTACH COLUMN / SUMEQ: whole-frame scalar
    * `sum(a) == sum(b)` broadcast to every row (booleans count as
    * 1/0). Compiled as a 1-row aggregate broadcast-cross-joined back —
    * NOT a window over an empty partition, which would funnel the
    * whole table through one partition at scale.
    */
  def attachSumEq(name: String, a: String, b: String)(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.BooleanType
    // Pandas sums native dtypes (booleans count as 1/0; floats stay
    // float — no truncation) and an empty/all-null sum is 0, not null.
    def s(c: String) = {
      val base = if (df.schema(c).dataType == BooleanType) col(c).cast("long") else col(c)
      coalesce(sum(base), lit(0))
    }
    val sums = df.agg(s(a).as("__sa"), s(b).as("__sb"))
    df.crossJoin(broadcast(sums))
      .withColumn(name, col("__sa") === col("__sb"))
      .drop("__sa", "__sb")
  }

  /** C6 ATTACH COLUMN / NULL: `if src IS NULL then lit(value) else
    * col(otherCol)` (np.where).
    */
  def attachNullFill(name: String, src: String, value: String, otherCol: String)(
      df: DataFrame): DataFrame =
    df.withColumn(name, when(col(src).isNull, lit(value)).otherwise(col(otherCol)))

  /** C7 DECISION COLUMN: left-join a small lookup table
    * (lookupValue → output) onto `lookupCol`; unmatched rows stay
    * null. The table is broadcast — it is worksheet-sized by
    * construction.
    */
  def decisionColumn(newCol: String, lookupCol: String, table: DataFrame)(
      df: DataFrame): DataFrame = {
    // table schema: (lookup_value, output)
    val t = table.toDF("__lk", newCol)
    df.join(broadcast(t), df(lookupCol) === t("__lk"), "left").drop("__lk")
  }

  /** C7 alternate compilation: fold the mapping into a when-chain —
    * zero join, stays in codegen; used when the mapping is available
    * driver-side as literals.
    */
  def decisionColumnWhenChain(
      newCol: String,
      lookupCol: String,
      mapping: Seq[(String, String)])(df: DataFrame): DataFrame = {
    val c = mapping.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(col(lookupCol) === lit(k), lit(v)).otherwise(acc)
    }
    df.withColumn(newCol, c)
  }

  /** C8 composite key: country#site#subject. */
  def concatKey(name: String, sep: String, cols: Seq[String])(df: DataFrame): DataFrame =
    df.withColumn(name, concat_ws(sep, cols.map(col): _*))

  // ===== §2.7 rows =====

  /** R1 BIND ROWS: union by column name, missing columns → null. */
  def bindRows(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** R5 set operations (beyond-reference): SQL INTERSECT/EXCEPT
    * (distinct semantics). Both plan as an aggregate + semi/anti
    * join on all columns — shuffle key is the full row, partial
    * aggregation applies; never a sort-based set diff.
    */
  def intersectRows(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)
  def exceptRows(a: DataFrame, b: DataFrame): DataFrame = a.except(b)

  /** R2 SORT DATASET: one direction for all cols, nulls last both
    * ways (pandas semantics).
    */
  def sortDataset(cols: Seq[String], desc: Boolean)(df: DataFrame): DataFrame =
    df.orderBy(sortCols(cols.map(SortKey(_, desc))): _*)

  /** R3 REMOVE ROWS: `col=NULL` → drop rows where col is null. */
  def removeRows(c: String)(df: DataFrame): DataFrame =
    df.filter(col(c).isNotNull)
}
