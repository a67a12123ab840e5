package graft

import org.apache.spark.sql.DataFrame

import graft.engine.{Interpreter, PipelineContext, SourceResolver, StudyRunner}
import graft.model._

class EngineSpec extends SparkSpec {
  import spark.implicits._

  private def resolver(tables: (String, DataFrame)*): SourceResolver = new SourceResolver {
    private val m = tables.toMap
    def storeView(studyCode: String, view: String): DataFrame = m(view)
    def table(name: String): DataFrame = m(name)
  }

  private def op(out: String, tpe: String, frames: Seq[String], cond: String = "") =
    OperationSpec(out, tpe, frames, cond)

  test("SORT DATASET is metadata; GROUPBY SLICE consumes it as a window") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val ctx0 = PipelineContext().bind("t", df)
    val ctx = Seq(
      op("s", "SORT DATASET", Seq("t"), "sort_cols=v, sort_order=DESC"),
      op("top", "GROUPBY SLICE", Seq("s"), "group_by_cols=g, slice_num=1")
    ).foldLeft(ctx0)((c, o) => Interpreter.applyOp(c, o, Map.empty))
    val r = ctx.result("top").orderBy("g").collect().map(x => (x.getString(0), x.getInt(1)))
    assert(r.toSeq == Seq(("a", 3), ("b", 9)))
    // no physical sort was planned for the intermediate
    assert(!ctx.df("s").queryExecution.optimizedPlan.toString.toLowerCase.contains("sort"))
  }

  test("terminal SORT DATASET is applied physically on result()") {
    val df = Seq(3, 1, 2).toDF("v")
    val ctx = Interpreter.applyOp(
      PipelineContext().bind("t", df),
      op("s", "SORT DATASET", Seq("t"), "sort_cols=v"), Map.empty)
    assert(ctx.result("s").collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("RENAME COLUMN remaps threaded sort keys") {
    val df = Seq(("a", 2, "x2"), ("a", 1, "x1")).toDF("g", "v", "p")
    val ctx = Seq(
      op("s", "SORT DATASET", Seq("t"), "sort_cols=v"),
      op("r", "RENAME COLUMN", Seq("s"), "v = renamed_v"),
      op("u", "UNIQUE COLUMN", Seq("r"), "g")
    ).foldLeft(PipelineContext().bind("t", df))((c, o) => Interpreter.applyOp(c, o, Map.empty))
    // keep-first under the remapped order: renamed_v=1 row survives
    assert(ctx.result("u").collect().map(_.getString(2)).toSeq == Seq("x1"))
  }

  test("order metadata survives SELECT DISTINCT, GROUPBY SLICE and LEFT JOIN (pandas preserves row order)") {
    val df = Seq(("a", 2, "late"), ("a", 1, "early"), ("b", 5, "only")).toDF("g", "v", "p")
    // SORT → SELECT DISTINCT (keys survive) → UNIQUE keep-first must
    // still honor the sort; dropping the metadata would fall back to
    // arbitrary dropDuplicates
    val ctx = Seq(
      op("s", "SORT DATASET", Seq("t"), "sort_cols=v"),
      op("d", "SELECT DISTINCT", Seq("s"), "g, v, p"),
      op("u", "UNIQUE COLUMN", Seq("d"), "g")
    ).foldLeft(PipelineContext().bind("t", df))((c, o) => Interpreter.applyOp(c, o, Map.empty))
    assert(ctx.order("d").nonEmpty, "SELECT DISTINCT must keep surviving sort keys")
    assert(ctx.result("u").orderBy("g").collect().map(_.getString(2)).toSeq ==
      Seq("early", "only"))
    // GROUPBY SLICE drops no columns: order survives for a later consumer
    val ctx2 = Seq(
      op("s", "SORT DATASET", Seq("t"), "sort_cols=v"),
      op("top", "GROUPBY SLICE", Seq("s"), "group_by_cols=g, slice_num=2"),
      op("u2", "UNIQUE COLUMN", Seq("top"), "g")
    ).foldLeft(PipelineContext().bind("t", df))((c, o) => Interpreter.applyOp(c, o, Map.empty))
    assert(ctx2.order("top").nonEmpty)
    assert(ctx2.result("u2").orderBy("g").collect().map(_.getString(2)).toSeq ==
      Seq("early", "only"))
    // LEFT JOIN keeps the left order when keys come through unsuffixed
    val right = Seq(("a", "ra"), ("b", "rb")).toDF("g", "extra")
    val ctx3 = Seq(
      op("s", "SORT DATASET", Seq("t"), "sort_cols=v"),
      op("j", "LEFT JOIN", Seq("s", "r"), "g"),
      op("u3", "UNIQUE COLUMN", Seq("j"), "g")
    ).foldLeft(PipelineContext().bind("t", df).bind("r", right))(
      (c, o) => Interpreter.applyOp(c, o, Map.empty))
    assert(ctx3.order("j").nonEmpty, "left join must keep the left frame's order")
    assert(ctx3.result("u3").orderBy("g").collect().map(_.getString(2)).toSeq ==
      Seq("early", "only"))
    // ...and when the suffix policy renamed a sort-key column, the
    // metadata remaps to the deterministic _x name (pandas preserves
    // the left frame's physical order through the merge; the left
    // copy of 'v' IS the order those rows carry)
    val clash = Seq(("a", 7, "x")).toDF("g", "v", "q") // 'v' collides → v_x/v_y
    val ctx4 = Seq(
      op("s", "SORT DATASET", Seq("t"), "sort_cols=v"),
      op("j2", "LEFT JOIN", Seq("s", "c"), "g"),
      op("u4", "UNIQUE COLUMN", Seq("j2"), "g")
    ).foldLeft(PipelineContext().bind("t", df).bind("c", clash))(
      (c, o) => Interpreter.applyOp(c, o, Map.empty))
    assert(ctx4.order("j2").map(_.col) == Seq("v_x"),
      "suffixed sort keys must remap to the left copy's _x name")
    assert(ctx4.result("u4").orderBy("g").collect().map(_.getString(2)).toSeq ==
      Seq("early", "only"))
  }

  test("order survives a projection that prunes its sort key (pandas keeps row order)") {
    // SORT by v → SELECT COLUMNS g,p (v pruned) → UNIQUE COLUMN g:
    // pandas keeps the physical order, so keep-first still honors the
    // sort; the engine retains v as a hidden __ord_ column
    val df = Seq(("a", 2, "late"), ("a", 1, "early"), ("b", 5, "only")).toDF("g", "v", "p")
    val ctx = Seq(
      op("s", "SORT DATASET", Seq("t"), "sort_cols=v"),
      op("sel", "SELECT COLUMNS", Seq("s"), "g, p"),
      op("u", "UNIQUE COLUMN", Seq("sel"), "g")
    ).foldLeft(PipelineContext().bind("t", df))((c, o) => Interpreter.applyOp(c, o, Map.empty))
    assert(ctx.order("sel").nonEmpty, "pruning the sort key must not drop the order")
    val out = ctx.result("u").orderBy("g")
    assert(out.columns.toSeq == Seq("g", "p"), "hidden columns must not reach the output")
    assert(out.collect().map(_.getString(1)).toSeq == Seq("early", "only"))
    // SUMMARISE first/last after the pruning projection must work too
    // (previously threw 'requires a preceding SORT DATASET')
    val ctx2 = Seq(
      op("s", "SORT DATASET", Seq("t"), "sort_cols=v"),
      op("sel", "SELECT COLUMNS", Seq("s"), "g, p"),
      op("agg", "GROUPBY SUMMARISE", Seq("sel"), "group_by_cols=g | summary_col_ops=p#last")
    ).foldLeft(PipelineContext().bind("t", df))((c, o) => Interpreter.applyOp(c, o, Map.empty))
    assert(ctx2.result("agg").orderBy("g").collect().map(_.getString(1)).toSeq ==
      Seq("late", "only"))
  }

  test("REMOVE COLUMN of a sort key keeps the order hidden; the removed name is gone") {
    val df = Seq(("a", 2, "late"), ("a", 1, "early")).toDF("g", "v", "p")
    val ctx = Seq(
      op("s", "SORT DATASET", Seq("t"), "sort_cols=v"),
      op("rm", "REMOVE COLUMN", Seq("s"), "v"),
      op("u", "UNIQUE COLUMN", Seq("rm"), "g")
    ).foldLeft(PipelineContext().bind("t", df))((c, o) => Interpreter.applyOp(c, o, Map.empty))
    assert(!ctx.df("rm").columns.contains("v"), "the removed visible name must be gone")
    val out = ctx.result("u")
    assert(out.columns.toSeq == Seq("g", "p"))
    assert(out.collect().map(_.getString(1)).toSeq == Seq("early"))
  }

  test("SELECT DISTINCT pruning the sort key keeps first occurrences' order downstream") {
    // rows: (g=a,p=x) appears at v=2 and v=9; (g=a,p=y) at v=5.
    // distinct on (g,p) keeps first occurrences: x@2, y@5 — a later
    // UNIQUE COLUMN g must pick x (v=2), not y
    val df = Seq(("a", 2, "x"), ("a", 5, "y"), ("a", 9, "x")).toDF("g", "v", "p")
    val ctx = Seq(
      op("s", "SORT DATASET", Seq("t"), "sort_cols=v"),
      op("d", "SELECT DISTINCT", Seq("s"), "g, p"),
      op("u", "UNIQUE COLUMN", Seq("d"), "g")
    ).foldLeft(PipelineContext().bind("t", df))((c, o) => Interpreter.applyOp(c, o, Map.empty))
    assert(ctx.order("d").nonEmpty)
    val out = ctx.result("u")
    assert(out.columns.toSeq == Seq("g", "p"))
    assert(out.collect().map(_.getString(1)).toSeq == Seq("x"))
  }

  test("analyte boundary strips hidden retained keys from the stitched study") {
    val subjects = Seq(("alice", 2, "late"), ("alice", 1, "early"), ("bob", 3, "b"))
      .toDF("subject", "v", "p")
    val study = StudySpec("s1", Seq(
      AnalyteSpec("base",
        Seq(GetDataSpec("base", SourceKind.ParquetTable("subjects"))),
        Seq(
          op("base", "SORT DATASET", Seq("base"), "sort_cols=v"),
          op("base", "SELECT COLUMNS", Seq("base"), "subject, p"),
          op("base", "UNIQUE COLUMN", Seq("base"), "subject")))),
      stitchKey = "subject")
    val r = StudyRunner.run(study, resolver("subjects" -> subjects))
    assert(r.columns.toSeq == Seq("subject", "p"), s"hidden cols leaked: ${r.columns.toSeq}")
    assert(r.orderBy("subject").collect().map(_.getString(1)).toSeq == Seq("early", "b"))
  }

  test("GROUPBY SUMMARISE last uses the threaded order") {
    val df = Seq(("g", 1, 10.0), ("g", 2, 20.0)).toDF("g", "k", "v")
    val ctx = Seq(
      op("s", "SORT DATASET", Seq("t"), "sort_cols=k"),
      op("agg", "GROUPBY SUMMARISE", Seq("s"), "group_by_cols=g | summary_col_ops=v#last")
    ).foldLeft(PipelineContext().bind("t", df))((c, o) => Interpreter.applyOp(c, o, Map.empty))
    assert(ctx.result("agg").collect().head.getDouble(1) == 20.0)
  }

  test("ATTACH COLUMN variants dispatch by operation key") {
    val df = Seq((Some(1.0), 2.0, "o")).toDF("a", "b", "other")
    val base = PipelineContext().bind("t", df)
    val nn = Interpreter.applyOp(base,
      op("o1", "ATTACH COLUMN", Seq("t"), "column_name=f, source_col=a, operation=NOTNULL"), Map.empty)
    assert(nn.df("o1").columns.contains("f"))
    val se = Interpreter.applyOp(base,
      op("o2", "ATTACH COLUMN", Seq("t"), "column_name=f, source_col=a|b, operation=SUMEQ"), Map.empty)
    assert(!se.df("o2").collect().head.getBoolean(3))
    val nf = Interpreter.applyOp(base,
      op("o3", "ATTACH COLUMN", Seq("t"),
        "column_name=f, source_col=a, operation=NULL, value=V, column_value=other"), Map.empty)
    assert(nf.df("o3").collect().head.getString(3) == "o")
  }

  test("DECISION COLUMN resolves the named table; unmatched stays null") {
    val df = Seq("Yes", "No", "???").toDF("c")
    val tables = Map("TBL" -> DecisionTable("TBL", Seq("Yes" -> "1", "No" -> "0")))
    val ctx = Interpreter.applyOp(PipelineContext().bind("t", df),
      op("o", "DECISION COLUMN", Seq("t"),
        "new_column=code, lookup_column=c, decision_table_name=TBL"), tables)
    assert(ctx.df("o").collect().map(r => Option(r.getString(1))).toSeq ==
      Seq(Some("1"), Some("0"), None))
  }

  test("QUALIFIED JOIN parses qualified keys and an optional how") {
    val l = Seq((1, "a")).toDF("lk", "lv")
    val r = Seq((1, "b"), (2, "c")).toDF("rk", "rv")
    val ctx = Interpreter.applyOp(
      PipelineContext().bind("l", l).bind("r", r),
      op("j", "QUALIFIED JOIN", Seq("l", "r", "inner"), "l.lk = r.rk"), Map.empty)
    val rows = ctx.df("j").collect()
    assert(rows.length == 1 && rows.head.getString(3) == "b")
  }

  test("REMOVE ROWS rejects a non-NULL operand like the reference") {
    val e = intercept[IllegalArgumentException] {
      Interpreter.applyOp(PipelineContext().bind("t", Seq(1).toDF("x")),
        op("o", "REMOVE ROWS", Seq("t"), "x=SOMETHING"), Map.empty)
    }
    assert(e.getMessage.contains("REMOVE ROWS"))
    // the operand set is EXACTLY {NULL, NULL1} — a NULL* prefix like
    // NULLX ValueErrors in the reference (:363-369) and must here too
    val e2 = intercept[IllegalArgumentException] {
      Interpreter.applyOp(PipelineContext().bind("t", Seq(1).toDF("x")),
        op("o", "REMOVE ROWS", Seq("t"), "x=NULLX"), Map.empty)
    }
    assert(e2.getMessage.contains("REMOVE ROWS"))
    // both accepted spellings drop null rows identically
    val withNull = Seq[(Integer, Int)]((null, 1), (2, 2)).toDF("x", "y")
    Seq("NULL", "null1").foreach { operand =>
      val kept = Interpreter.applyOp(PipelineContext().bind("t", withNull),
        op("o", "REMOVE ROWS", Seq("t"), s"x=$operand"), Map.empty).df("o")
      assert(kept.collect().map(_.getInt(1)).toSeq == Seq(2), operand)
    }
  }

  test("unknown op type raises like the reference dispatcher") {
    val e = intercept[IllegalArgumentException] {
      Interpreter.applyOp(PipelineContext().bind("t", Seq(1).toDF("x")),
        op("o", "FROBNICATE", Seq("t")), Map.empty)
    }
    assert(e.getMessage.contains("NON-EXISTING DF_OPERATION"))
  }

  test("GET_DATA: filter then tolerant projection, bound by view name") {
    val src = Seq(("s1", "A", 1), ("s1", "B", 2)).toDF("k", "cat", "v")
    val ctx = Interpreter.getData(PipelineContext(), Seq(
      GetDataSpec("view1", SourceKind.StoreView("s1", "view1"),
        columns = Seq("cat", "v"), filter = Some("cat = A"))),
      resolver("view1" -> src))
    val r = ctx.df("view1")
    assert(r.columns.toSeq == Seq("cat", "v"))
    assert(r.collect().map(_.getInt(1)).toSeq == Seq(1))
  }

  test("StudyRunner stitches analytes left-joined on the stitch key") {
    val subjects = Seq(("s1", "alice"), ("s1", "bob")).toDF("study", "subject")
    val scores = Seq(("alice", 9.5)).toDF("subject", "score")
    val study = StudySpec("s1", Seq(
      AnalyteSpec("base", Seq(GetDataSpec("base", SourceKind.ParquetTable("subjects"))), Nil),
      AnalyteSpec("scores", Seq(GetDataSpec("scores", SourceKind.ParquetTable("scores"))), Nil)),
      stitchKey = "subject")
    val r = StudyRunner.run(study, resolver("subjects" -> subjects, "scores" -> scores))
      .select("subject", "score").orderBy("subject").collect()
    assert(r.map(x => (x.getString(0), Option(x.get(1)))).toSeq ==
      Seq(("alice", Some(9.5)), ("bob", None)))
  }

  test("AnalyteRef memoization: later analyte reads an earlier one from the catalog") {
    val base = Seq(("alice", 1), ("bob", 2)).toDF("subject", "v")
    val study = StudySpec("s1", Seq(
      AnalyteSpec("a1", Seq(GetDataSpec("a1", SourceKind.ParquetTable("base"))), Nil),
      AnalyteSpec("a2",
        Seq(GetDataSpec("a1", SourceKind.AnalyteRef)),
        Seq(op("a2", "FILTER", Seq("a1"), "v >= NUMBER(2)")))),
      stitchKey = "subject")
    val r = StudyRunner.run(study, resolver("base" -> base))
      .select("subject", "v_y").orderBy("subject").collect()
    // a2 has only bob → alice's right side null
    assert(r.map(x => (x.getString(0), Option(x.get(1)))).toSeq ==
      Seq(("alice", None), ("bob", Some(2))))
  }

  test("overwriting a sort-key column freezes the PRE-overwrite order, like pandas") {
    // lexicographic string order ('03-01-2021' < '04-12-2020') is the
    // order the sort established; FORMAT COLUMN then reparses the
    // values chronologically (2020-12-04 < 2021-01-03). pandas keeps
    // the PHYSICAL order from sort time — keep-first must see jan3.
    val df = Seq(("a", "03-01-2021", "jan3"), ("a", "04-12-2020", "dec4"))
      .toDF("g", "d", "tag")
    val ctx = Seq(
      op("s", "SORT DATASET", Seq("t"), "sort_cols=d"),
      op("f", "FORMAT COLUMN", Seq("s"), "column=d, type=datetime#%d-%m-%Y"),
      op("u", "UNIQUE COLUMN", Seq("f"), "g")
    ).foldLeft(PipelineContext().bind("t", df))((c, o) => Interpreter.applyOp(c, o, Map.empty))
    assert(ctx.result("u").collect().map(_.getAs[String]("tag")).toSeq == Seq("jan3"))
    // the shield is transparent: no hidden column in the visible output
    assert(!ctx.result("u").columns.exists(_.startsWith("__ord_")))
  }

  test("GROUPBY SUMMARISE output is ordered by its group keys, like pandas groupby(sort=True)") {
    val df = Seq(("b", 2, 1.0), ("a", 1, 2.0), ("a", 2, 3.0)).toDF("g", "k", "v")
    // downstream order-dependent ops may lean on the group-key order
    // with NO explicit sort — pandas runs this config as-is
    val ctx = Seq(
      op("agg", "GROUPBY SUMMARISE", Seq("t"), "group_by_cols=g | summary_col_ops=v#sum"),
      op("top", "GROUPBY SLICE", Seq("agg"), "group_by_cols=g, slice_num=1")
    ).foldLeft(PipelineContext().bind("t", df))((c, o) => Interpreter.applyOp(c, o, Map.empty))
    assert(ctx.result("agg").collect().map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(ctx.result("top").count() == 2)
  }

  test("re-shielding a sort key after a later sort replaces the stale snapshot") {
    // sort d (string order: '10' < '2'), FORMAT d number (shield #1),
    // sort d again (numeric order: 2.0 < 10.0), FORMAT d number
    // (shield #2 — used to crash on the stale __ord_d from shield #1;
    // now the dead snapshot is dropped and re-taken)
    val df = Seq(("a", "2", "two"), ("a", "10", "ten")).toDF("g", "d", "tag")
    val ctx = Seq(
      op("s1", "SORT DATASET", Seq("t"), "sort_cols=d"),
      op("f1", "FORMAT COLUMN", Seq("s1"), "column=d, type=number"),
      op("s2", "SORT DATASET", Seq("f1"), "sort_cols=d"),
      op("f2", "FORMAT COLUMN", Seq("s2"), "column=d, type=number"),
      op("u", "UNIQUE COLUMN", Seq("f2"), "g")
    ).foldLeft(PipelineContext().bind("t", df))((c, o) => Interpreter.applyOp(c, o, Map.empty))
    assert(ctx.result("u").collect().map(_.getAs[String]("tag")).toSeq == Seq("two"))
    assert(!ctx.result("u").columns.exists(_.startsWith("__ord_")))
  }

  test("LEFT JOIN clears the order when the _x remap would be ambiguous") {
    // the left frame ALREADY has a 'v_x' column; the suffix policy
    // renames its 'v' to a second 'v_x' — keeping the remapped order
    // would make the next order-consuming op AMBIGUOUS_REFERENCE, so
    // the safe degrade is the pre-remap behavior: clear it
    val left = Seq(("a", 2, 99), ("a", 1, 98)).toDF("g", "v", "v_x")
    val right = Seq(("a", 7)).toDF("g", "v")
    val ctx = Seq(
      op("s", "SORT DATASET", Seq("t"), "sort_cols=v"),
      op("j", "LEFT JOIN", Seq("s", "c"), "g"),
      op("u", "UNIQUE COLUMN", Seq("j"), "g")
    ).foldLeft(PipelineContext().bind("t", left).bind("c", right))(
      (c, o) => Interpreter.applyOp(c, o, Map.empty))
    assert(ctx.order("j").isEmpty, "ambiguous remap must clear the order")
    assert(ctx.result("u").count() == 1) // and the pipeline still completes
  }

  test("store views reject a payload key column in any casing (silent-overwrite guard)") {
    // withColumn resolves case-insensitively under the default
    // spark.sql.caseSensitive=false — a payload 'Study_Code' would be
    // silently REPLACED by the key constant if only exact names were
    // checked
    val dir = java.nio.file.Files.createTempDirectory("graft_engine_store_case").toString
    Seq(("S-payload", "x")).toDF("Study_Code", "name")
      .agg(org.apache.spark.sql.functions.collect_list(
        org.apache.spark.sql.functions.struct($"Study_Code", $"name")).as("data"))
      .write.parquet(s"$dir/store/study_code=S1/view=V1")
    val e = intercept[IllegalArgumentException](
      new graft.engine.ParquetResolver(spark, dir).storeView("S1", "V1"))
    assert(e.getMessage.contains("conflicts"), e.getMessage)
  }

  test("the __ord_ namespace is reserved: sources and user-created names are rejected") {
    val df = Seq(("a", 1)).toDF("g", "v")
    // name-creating ops cannot mint a column inside the hidden namespace
    val e1 = intercept[IllegalArgumentException](Interpreter.applyOp(
      PipelineContext().bind("t", df),
      op("o", "ADD COLUMN", Seq("t"), "new_column=__ord_x, value=1"), Map.empty))
    assert(e1.getMessage.contains("reserved"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](Interpreter.applyOp(
      PipelineContext().bind("t", df),
      op("o", "RENAME COLUMN", Seq("t"), "v=__ord_v"), Map.empty))
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
    // and a source carrying one is rejected at the GET_DATA boundary,
    // so any __ord_ column mid-pipeline is engine-created by induction
    val bad = Seq(("a", 1)).toDF("g", "__ord_g")
    val resolver = new SourceResolver {
      def storeView(s: String, v: String): DataFrame = bad
      def table(n: String): DataFrame = bad
    }
    val e3 = intercept[IllegalArgumentException](Interpreter.getData(
      PipelineContext(),
      Seq(graft.model.GetDataSpec("x", graft.model.SourceKind.ParquetTable("bad"),
        Nil, None, distinct = false)),
      resolver))
    assert(e3.getMessage.contains("reserved"), e3.getMessage)
  }

  test("store views carry study_code and view columns (json_normalize meta parity)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_engine_store").toString
    val data = Seq(("S1", "V1", "x", 1.0)).toDF("study_code", "view", "name", "score")
    graft.io.NestedStore.write(
      graft.io.NestedStore.nest(data, "study_code", "view"), s"$dir/store")
    val v = new graft.engine.ParquetResolver(spark, dir).storeView("S1", "V1")
    // the reference's json_normalize(record_path='data',
    // meta=['study_code','view']) restores the keys on every row
    assert(v.columns.takeRight(2).toSeq == Seq("study_code", "view"))
    assert(v.select("study_code", "view", "name").collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2))).toSeq ==
      Seq(("S1", "V1", "x")))
  }
}
