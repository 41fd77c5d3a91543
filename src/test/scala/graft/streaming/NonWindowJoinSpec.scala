package graft.streaming

import graft.{SparkSuite, TestData}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.GroupStateTimeout

import scala.collection.mutable

/** Conformance ports of the reference's UNBOUNDED (non-windowed)
  * streaming outer joins — flink-table stream/table/JoinITCase.scala
  * testLeftJoinWithMultipleKeys (:418), testRightJoinWithMultipleKeys
  * (:519), testFullOuterJoinWithMultipleKeys (:592) and
  * testLeftJoinWithRetractionInput (:497) — asserting, like the
  * reference's RetractingSink, the MATERIALIZED retract-stream state.
  * Plus an exact per-element emission script for the retract/restore
  * protocol itself (first-match retracts the null-pad, losing the last
  * match restores it). */
class NonWindowJoinSpec extends SparkSuite {
  import spark.implicits._

  /** RetractingSink analog: a multiset the change stream folds into. */
  private final class Materializer {
    private val bag = mutable.Map.empty[String, Int]
    def apply(change: Boolean, row: String): Unit = bag.synchronized {
      val n = bag.getOrElse(row, 0) + (if (change) 1 else -1)
      assert(n >= 0, s"retracted non-existent row $row")
      if (n == 0) bag.remove(row) else bag.update(row, n)
    }
    def rows: Seq[String] = bag.synchronized {
      bag.toSeq.flatMap { case (r, n) => Seq.fill(n)(r) }.sorted
    }
  }

  private type T3 = (Option[Int], Long, String)
  private type T5 = (Option[Int], Long, Int, String, Long)

  // the stream fixtures: get3TupleDataStream / get5TupleDataStream with
  // the null-key substitutions the multi-key tests apply
  private def t3Opt(nullAt21: Boolean): Seq[T3] =
    TestData.t3Rows.map { case (a, b, c) =>
      (if (nullAt21 && a == 21) None else Some(a), b, c)
    }
  private def t5Opt(nullAtE15: Boolean): Seq[T5] =
    TestData.t5Rows.map { case (d, e, f, g, h) =>
      (if (nullAtE15 && e == 15L) None else Some(d), e, f, g, h)
    }

  /** Run one ITCase port: stream both fixtures through
    * unboundedOuterJoin on (a,b)==(d,h) — or on a==d with a residual
    * non-equi `cond` — project (c, g), materialize. With `viaCols` the
    * SAME port runs through the Column-expression surface
    * ([[NonWindowJoinSql]]): keys as `Seq[Column]`, the residual as a
    * `Column` predicate (`colResidual`), output read back from the
    * flattened change-tagged DataFrame. */
  private def runPort(joinType: String, ds1: Seq[T3], ds2: Seq[T5],
      cond: Option[(T3, T5) => Boolean] = None,
      viaCols: Boolean = false,
      colResidual: Option[org.apache.spark.sql.Column] = None,
      onText: Option[String] = None): Seq[String] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val in1 = MemoryStream[T3]
    val in2 = MemoryStream[T5]
    val mat = new Materializer
    val q = if (viaCols || onText.isDefined) {
      val lDf = in1.toDS().toDF("a", "b", "c")
      val rDf = in2.toDS().toDF("d", "e", "f", "g", "h")
      val joined = (onText, colResidual) match {
        case (Some(t), _) =>
          NonWindowJoinSql.unboundedOuterJoinOn(lDf, rDf, t, joinType)
        case (None, None) => NonWindowJoinSql.unboundedOuterJoin(lDf, rDf,
          Seq(col("a"), col("b")), Seq(col("d"), col("h")), joinType)
        case (None, Some(res)) => NonWindowJoinSql.unboundedOuterJoin(lDf, rDf,
          Seq(col("a")), Seq(col("d")), joinType, Some(res))
      }
      joined.writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach { row =>
            val c = Option(row.getAs[String]("c")).getOrElse("null")
            val g = Option(row.getAs[String]("g")).getOrElse("null")
            mat(row.getAs[Boolean]("change"), c + "," + g)
          }
        }.start()
    } else {
      val joined = cond match {
        case None => NonWindowJoin.unboundedOuterJoin[(Int, Long), T3, T5](
          in1.toDS(), in2.toDS(),
          l => l._1.map(a => (a, l._2)),
          r => r._1.map(d => (d, r._5)),
          joinType)
        case Some(c) => NonWindowJoin.unboundedOuterJoin[Int, T3, T5](
          in1.toDS(), in2.toDS(),
          l => l._1, r => r._1, joinType, c)
      }
      joined.writeStream.outputMode("append")
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[(Boolean, Option[T3], Option[T5])],
              _: Long) =>
            df.collect().foreach { case (c, lo, ro) =>
              mat(c, lo.map(_._3).getOrElse("null") + "," +
                ro.map(_._4).getOrElse("null"))
            }
        }.start()
    }
    try {
      // three interleaved chunks so null-pads genuinely retract across
      // micro-batches (not an artifact of one-shot evaluation)
      val cuts1 = Seq(7, 14, ds1.size)
      val cuts2 = Seq(5, 10, ds2.size)
      var p1 = 0; var p2 = 0
      cuts1.zip(cuts2).foreach { case (c1, c2) =>
        in1.addData(ds1.slice(p1, c1): _*); p1 = c1
        in2.addData(ds2.slice(p2, c2): _*); p2 = c2
        q.processAllAvailable()
      }
    } finally q.stop()
    mat.rows
  }

  test("port: JoinITCase testLeftJoinWithMultipleKeys (retracted state)") {
    val expected = Seq(
      "Hi,Hallo", "Hello,Hallo Welt", "Hello world,Hallo Welt wie gehts?",
      "Hello world,ABC", "Hello world, how are you?,null", "I am fine.,HIJ",
      "I am fine.,IJK", "Luke Skywalker,null", "Comment#1,null",
      "Comment#2,null", "Comment#3,null", "Comment#4,null", "Comment#5,null",
      "Comment#6,null", "Comment#7,null", "Comment#8,null", "Comment#9,null",
      "Comment#10,null", "Comment#11,null", "Comment#12,null",
      "Comment#13,null", "Comment#14,null", "Comment#15,null")
    assert(runPort("left_outer", t3Opt(nullAt21 = true),
      t5Opt(nullAtE15 = true)) === expected.sorted)
  }

  test("port: JoinITCase testRightJoinWithMultipleKeys (retracted state)") {
    val expected = Seq(
      "Hi,Hallo", "Hello,Hallo Welt", "null,Hallo Welt wie",
      "Hello world,Hallo Welt wie gehts?", "Hello world,ABC", "null,BCD",
      "null,CDE", "null,DEF", "null,EFG", "null,FGH", "null,GHI",
      "I am fine.,HIJ", "I am fine.,IJK", "null,JKL", "null,KLM")
    assert(runPort("right_outer", t3Opt(nullAt21 = false),
      t5Opt(nullAtE15 = false)) === expected.sorted)
  }

  test("port: JoinITCase testFullOuterJoinWithMultipleKeys (retracted state)") {
    val expected = Seq(
      "Hi,Hallo", "Hello,Hallo Welt", "null,Hallo Welt wie",
      "Hello world,Hallo Welt wie gehts?", "Hello world,ABC", "null,BCD",
      "null,CDE", "null,DEF", "null,EFG", "null,FGH", "null,GHI",
      "I am fine.,HIJ", "I am fine.,IJK", "null,JKL", "null,KLM",
      "Luke Skywalker,null", "Comment#1,null", "Comment#2,null",
      "Comment#3,null", "Comment#4,null", "Comment#5,null", "Comment#6,null",
      "Comment#7,null", "Comment#8,null", "Comment#9,null", "Comment#10,null",
      "Comment#11,null", "Comment#12,null", "Comment#13,null",
      "Comment#14,null", "Comment#15,null", "Hello world, how are you?,null")
    assert(runPort("full_outer", t3Opt(nullAt21 = false),
      t5Opt(nullAtE15 = false)) === expected.sorted)
  }

  private val comments = (1 to 15).map(i => s"Comment#$i,null")

  test("port: JoinITCase testLeftJoinWithNonEquiJoinPred (a=d AND b<=h)") {
    val expected = Seq(
      "Hi,Hallo", "Hello,Hallo Welt", "Hello world,Hallo Welt wie gehts?",
      "Hello world,ABC", "Hello world,BCD", "I am fine.,HIJ",
      "I am fine.,IJK", "Hello world, how are you?,null",
      "Luke Skywalker,null") ++ comments
    assert(runPort("left_outer", t3Opt(nullAt21 = false),
      t5Opt(nullAtE15 = false),
      Some((l: T3, r: T5) => l._2 <= r._5)) === expected.sorted)
  }

  test("port: JoinITCase testLeftJoinWithLeftLocalPred (a=d AND b=2)") {
    val expected = Seq(
      "Hello,Hallo Welt", "Hello,Hallo Welt wie",
      "Hello world,Hallo Welt wie gehts?", "Hello world,ABC",
      "Hello world,BCD", "Hi,null", "Hello world, how are you?,null",
      "I am fine.,null", "Luke Skywalker,null") ++ comments
    assert(runPort("left_outer", t3Opt(nullAt21 = false),
      t5Opt(nullAtE15 = false),
      Some((l: T3, _: T5) => l._2 == 2L)) === expected.sorted)
  }

  test("port: JoinITCase testRightJoinWithNonEquiJoinPred (mirrored sides)") {
    // the reference swaps the sides (5-tuple left, 3-tuple right) and
    // right-outer-preserves the 3-tuple — same as our left-outer with
    // the fixture roles unchanged and the join type mirrored
    val expected = Seq(
      "Hi,Hallo", "Hello,Hallo Welt", "Hello world,Hallo Welt wie gehts?",
      "Hello world,ABC", "Hello world,BCD", "I am fine.,HIJ",
      "I am fine.,IJK", "Hello world, how are you?,null",
      "Luke Skywalker,null") ++ comments
    assert(runPort("left_outer", t3Opt(nullAt21 = false),
      t5Opt(nullAtE15 = false),
      Some((l: T3, r: T5) => l._2 <= r._5)) === expected.sorted)
    // and the genuinely right-outer shape on OUR side order: preserve
    // the 5-tuple side instead
    val expectedR = Seq(
      "Hi,Hallo", "Hello,Hallo Welt", "Hello world,Hallo Welt wie gehts?",
      "Hello world,ABC", "Hello world,BCD", "I am fine.,HIJ",
      "I am fine.,IJK", "null,Hallo Welt wie", "null,CDE", "null,DEF",
      "null,EFG", "null,FGH", "null,GHI", "null,JKL", "null,KLM")
    assert(runPort("right_outer", t3Opt(nullAt21 = false),
      t5Opt(nullAtE15 = false),
      Some((l: T3, r: T5) => l._2 <= r._5)) === expectedR.sorted)
  }

  test("port: JoinITCase testFullJoinWithNonEquiJoinPred (a=d AND b<=h)") {
    val expected = Seq(
      "Hi,Hallo", "Hello,Hallo Welt", "Hello world,Hallo Welt wie gehts?",
      "Hello world,ABC", "Hello world,BCD", "I am fine.,HIJ",
      "I am fine.,IJK",
      "Hello world, how are you?,null", "Luke Skywalker,null",
      "null,Hallo Welt wie", "null,CDE", "null,DEF", "null,EFG",
      "null,FGH", "null,GHI", "null,JKL", "null,KLM") ++ comments
    assert(runPort("full_outer", t3Opt(nullAt21 = false),
      t5Opt(nullAtE15 = false),
      Some((l: T3, r: T5) => l._2 <= r._5)) === expected.sorted)
  }

  test("Column surface: testLeftJoinWithMultipleKeys via Seq[Column] equi-keys") {
    // the same ported ITCase, driven through NonWindowJoinSql — the
    // Seq[Column] keys compile to the typed key lambdas, so the
    // materialized retract state must be identical to the typed run
    val expected = Seq(
      "Hi,Hallo", "Hello,Hallo Welt", "Hello world,Hallo Welt wie gehts?",
      "Hello world,ABC", "Hello world, how are you?,null", "I am fine.,HIJ",
      "I am fine.,IJK", "Luke Skywalker,null", "Comment#1,null",
      "Comment#2,null", "Comment#3,null", "Comment#4,null", "Comment#5,null",
      "Comment#6,null", "Comment#7,null", "Comment#8,null", "Comment#9,null",
      "Comment#10,null", "Comment#11,null", "Comment#12,null",
      "Comment#13,null", "Comment#14,null", "Comment#15,null")
    assert(runPort("left_outer", t3Opt(nullAt21 = true),
      t5Opt(nullAtE15 = true), viaCols = true) === expected.sorted)
  }

  test("Column surface: testFullJoinWithNonEquiJoinPred via Column residual (ON a = d AND b <= h)") {
    import org.apache.spark.sql.functions.col
    val expected = Seq(
      "Hi,Hallo", "Hello,Hallo Welt", "Hello world,Hallo Welt wie gehts?",
      "Hello world,ABC", "Hello world,BCD", "I am fine.,HIJ",
      "I am fine.,IJK",
      "Hello world, how are you?,null", "Luke Skywalker,null",
      "null,Hallo Welt wie", "null,CDE", "null,DEF", "null,EFG",
      "null,FGH", "null,GHI", "null,JKL", "null,KLM") ++ comments
    assert(runPort("full_outer", t3Opt(nullAt21 = false),
      t5Opt(nullAtE15 = false), viaCols = true,
      colResidual = Some(col("b") <= col("h"))) === expected.sorted)
  }

  // shared by the typed port and its Column-surface twin
  private lazy val fullJoinLeftLocalPredExpected = Seq(
    "Hello,Hallo Welt wie", "Hello world, how are you?,DEF",
    "Hello world, how are you?,EFG", "I am fine.,GHI",
    "Hi,null", "Hello world,null", "Luke Skywalker,null",
    "null,Hallo", "null,Hallo Welt", "null,Hallo Welt wie gehts?",
    "null,ABC", "null,BCD", "null,CDE", "null,FGH", "null,HIJ",
    "null,IJK", "null,JKL", "null,KLM") ++ comments

  test("Column surface: testFullJoinWithLeftLocalPred via Column residual (b >= 2 AND h = 1)") {
    // a residual made of per-side LOCAL predicates (still evaluated
    // inside the outer-join condition, never pushed as filters — the
    // SQL outer-join contract the typed port pins)
    import org.apache.spark.sql.functions.col
    assert(runPort("full_outer", t3Opt(nullAt21 = false),
      t5Opt(nullAtE15 = false), viaCols = true,
      colResidual = Some(col("b") >= 2L && col("h") === 1L)) ===
      fullJoinLeftLocalPredExpected.sorted)
  }

  test("Column surface rejections: key arity/type mismatch, non-boolean or nondeterministic residual") {
    import org.apache.spark.sql.functions.{col, rand}
    val lDf = Seq((1, 1L, "x")).toDF("a", "b", "c")
    val rDf = Seq((1, "y", 2L)).toDF("d", "g", "h")
    def named(body: => Any): String =
      intercept[IllegalArgumentException](body).getMessage
    assert(named(NonWindowJoinSql.unboundedOuterJoin(lDf, rDf,
      Seq(col("a"), col("b")), Seq(col("d")), "left_outer"))
      .contains("arity"))
    assert(named(NonWindowJoinSql.unboundedOuterJoin(lDf, rDf,
      Seq(col("b")), Seq(col("d")), "left_outer"))
      .contains("types must match"))
    assert(named(NonWindowJoinSql.unboundedOuterJoin(lDf, rDf,
      Seq(col("a")), Seq(col("d")), "left_outer",
      residual = Some(col("h")))).contains("BOOLEAN"))
    assert(named(NonWindowJoinSql.unboundedOuterJoin(lDf, rDf,
      Seq(col("a")), Seq(col("d")), "left_outer",
      residual = Some(rand() > 0.5))).contains("deterministic"))
    // MAP-typed keys: no canonical serialization order — named error
    import org.apache.spark.sql.functions.map
    val lMap = lDf.withColumn("m", map(col("a"), col("b")))
    val rMap = rDf.withColumn("m", map(col("d"), col("h")))
    assert(named(NonWindowJoinSql.unboundedOuterJoin(lMap, rMap,
      Seq(col("m")), Seq(col("m")), "left_outer")).contains("MAP"))
    // nested float inside a struct key: signed zeros would not
    // normalize — named error (top-level doubles are fine, see the
    // -0.0/0.0 join test)
    import org.apache.spark.sql.functions.struct
    val lStr = lDf.withColumn("s",
      struct(col("b").cast("double").as("x"), col("a").as("y")))
    val rStr = rDf.withColumn("s",
      struct(col("h").cast("double").as("x"), col("d").as("y")))
    assert(named(NonWindowJoinSql.unboundedOuterJoin(lStr, rStr,
      Seq(col("s")), Seq(col("s")), "left_outer")).contains("nest"))
  }

  test("SQL-text surface: testLeftJoinWithMultipleKeys via ON a = d AND b = h") {
    // the reference's exact SQL condition text, parsed and split into
    // equi-keys + residual the way its planner does — same ported
    // ITCase, same materialized state as the typed and Column runs
    val expected = Seq(
      "Hi,Hallo", "Hello,Hallo Welt", "Hello world,Hallo Welt wie gehts?",
      "Hello world,ABC", "Hello world, how are you?,null", "I am fine.,HIJ",
      "I am fine.,IJK", "Luke Skywalker,null", "Comment#1,null",
      "Comment#2,null", "Comment#3,null", "Comment#4,null", "Comment#5,null",
      "Comment#6,null", "Comment#7,null", "Comment#8,null", "Comment#9,null",
      "Comment#10,null", "Comment#11,null", "Comment#12,null",
      "Comment#13,null", "Comment#14,null", "Comment#15,null")
    assert(runPort("left_outer", t3Opt(nullAt21 = true),
      t5Opt(nullAtE15 = true),
      onText = Some("a = d AND b = h")) === expected.sorted)
  }

  test("SQL-text surface: testFullJoinWithNonEquiJoinPred via ON a = d AND b <= h") {
    val expected = Seq(
      "Hi,Hallo", "Hello,Hallo Welt", "Hello world,Hallo Welt wie gehts?",
      "Hello world,ABC", "Hello world,BCD", "I am fine.,HIJ",
      "I am fine.,IJK",
      "Hello world, how are you?,null", "Luke Skywalker,null",
      "null,Hallo Welt wie", "null,CDE", "null,DEF", "null,EFG",
      "null,FGH", "null,GHI", "null,JKL", "null,KLM") ++ comments
    assert(runPort("full_outer", t3Opt(nullAt21 = false),
      t5Opt(nullAtE15 = false),
      onText = Some("a = d AND b <= h")) === expected.sorted)
  }

  test("SQL-text surface: equality-to-literal conjuncts stay in the residual (ON a = d AND b = 2)") {
    // b = 2 is an equality but not a cross-side key pair — it must run
    // INSIDE the outer-join condition (never pushed as a filter), the
    // ported testLeftJoinWithLeftLocalPred semantics
    val expected = Seq(
      "Hello,Hallo Welt", "Hello,Hallo Welt wie",
      "Hello world,Hallo Welt wie gehts?", "Hello world,ABC",
      "Hello world,BCD", "Hi,null", "Hello world, how are you?,null",
      "I am fine.,null", "Luke Skywalker,null") ++ comments
    assert(runPort("left_outer", t3Opt(nullAt21 = false),
      t5Opt(nullAtE15 = false),
      onText = Some("a = d AND b = 2")) === expected.sorted)
  }

  test("SQL-text surface rejections: missing equi conjunct, unknown/ambiguous/qualified names") {
    val lDf = Seq((1, 1L, "x")).toDF("a", "b", "c")
    val rDf = Seq((1, "y", 2L)).toDF("d", "g", "h")
    def named(body: => Any): String =
      intercept[IllegalArgumentException](body).getMessage
    // no cross-side equi pair: non-equi alone cannot key the state
    assert(named(NonWindowJoinSql.unboundedOuterJoinOn(lDf, rDf,
      "b <= h", "left_outer")).contains("equi-key"))
    // same-side equality does not count as a key either
    assert(named(NonWindowJoinSql.unboundedOuterJoinOn(lDf, rDf,
      "a = b AND b <= h", "left_outer")).contains("equi-key"))
    assert(named(NonWindowJoinSql.unboundedOuterJoinOn(lDf, rDf,
      "a = nosuch", "left_outer")).contains("neither"))
    val rAmb = Seq((1, "y", 2L)).toDF("a", "g", "h")
    assert(named(NonWindowJoinSql.unboundedOuterJoinOn(lDf, rAmb,
      "a = g", "left_outer")).contains("across the two inputs"))
    // duplicate match INSIDE one input (case-insensitive default
    // resolution): the error must say WHICH input, not "rename one side"
    val lDup = Seq((1, 2, "x")).toDF("A", "a", "c")
    assert(named(NonWindowJoinSql.unboundedOuterJoinOn(lDup, rDf,
      "a = d", "left_outer")).contains("WITHIN the left"))
    // a qualified-looking reference: its HEAD must be a real column
    assert(named(NonWindowJoinSql.unboundedOuterJoinOn(lDf, rDf,
      "l.a = d", "left_outer")).contains("neither"))
    // a cross-side pair mixing STRING with numeric: named rejection
    // (string promotion would key on textual representations)
    val rStr = Seq(("1", "y")).toDF("d", "g")
    assert(named(NonWindowJoinSql.unboundedOuterJoinOn(lDf, rStr,
      "a = d", "left_outer")).contains("STRING"))
    // ...including promotion of a NESTED field: struct<x:STRING> vs
    // struct<x:INT> widens to struct<x:STRING> — same hazard, same
    // named rejection (the top-level types are both STRUCT)
    import org.apache.spark.sql.functions.{col, struct}
    val lNest = lDf.withColumn("sl", struct(col("c").as("x")))
    val rNest = rDf.withColumn("sr", struct(col("d").as("x")))
    assert(named(NonWindowJoinSql.unboundedOuterJoinOn(lNest, rNest,
      "sl = sr", "left_outer")).contains("STRING"))
  }

  test("SQL-text surface: higher-order residuals construct; body names defer to analysis") {
    // review r16 verified against the parsed tree: EVERY bare name in
    // a lambda body (bound variable or outer column) parses as
    // UnresolvedNamedLambdaVariable, so the upfront pass neither
    // rejects nor validates them — legal HOF residuals construct, and
    // a bad body name surfaces through the residual's own analysis
    // (which also names the column), not the upfront named error
    import org.apache.spark.sql.functions.{array, lit}
    val lDf = Seq((1, "x")).toDF("a", "c")
      .withColumn("tags", array(lit("vip"), lit("new")))
    val rDf = Seq((1, "y")).toDF("d", "g")
    val df = NonWindowJoinSql.unboundedOuterJoinOn(lDf, rDf,
      "a = d AND exists(tags, t -> t = 'vip')", "left_outer")
    assert(df.columns.contains("change"))
    val ex = intercept[org.apache.spark.sql.AnalysisException](
      NonWindowJoinSql.unboundedOuterJoinOn(lDf, rDf,
        "a = d AND exists(tags, t -> t = nosuch)", "left_outer"))
    assert(ex.getMessage.contains("nosuch"))
  }

  test("SQL-text surface: implicit key coercion (INT = BIGINT) and exact dotted names") {
    // the planner-parity route inserts the implicit cast the reference
    // planner does: a = d with a:INT, d:BIGINT keys on the tightest
    // common type instead of rejecting
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in1 = MemoryStream[(Int, String)]
    val in2 = MemoryStream[(Long, String)]
    val mat = new Materializer
    val joined = NonWindowJoinSql.unboundedOuterJoinOn(
      in1.toDS().toDF("a", "l"), in2.toDS().toDF("d", "r"), "a = d",
      "inner")
    val q = joined.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(row => mat(row.getAs[Boolean]("change"),
          row.getAs[String]("l") + "," + row.getAs[String]("r")))
      }.start()
    try {
      in1.addData((7, "lA"))
      in2.addData((7L, "rA"), (8L, "rB"))
      q.processAllAvailable()
    } finally q.stop()
    assert(mat.rows === Seq("lA,rA"))
    // a column literally named "a.b": backquoted in the ON text, built
    // as an EXACT attribute (col("a.b") would re-parse the dot as
    // struct-field access) — construction must succeed
    val lDot = Seq((1, "x")).toDF("a.b", "l")
    val rDot = Seq((1, "y")).toDF("d", "r")
    NonWindowJoinSql.unboundedOuterJoinOn(lDot, rDot,
      "`a.b` = d", "left_outer")
    // INT = DECIMAL coerces through decimal widening (the tightest-
    // common-type lattice alone would reject it)
    import org.apache.spark.sql.functions.col
    val lInt = Seq((1, "x")).toDF("a", "l")
    val rDec = Seq((1L, "y")).toDF("d", "r")
      .withColumn("d", col("d").cast("decimal(10,0)"))
    NonWindowJoinSql.unboundedOuterJoinOn(lInt, rDec,
      "a = d", "left_outer")
    // struct-field access in the RESIDUAL (multi-part reference on the
    // head column) — legal, matching the Column surface's residual
    // language
    val lStruct = Seq((1, 2, "x")).toDF("a", "x0", "l")
      .withColumn("s", org.apache.spark.sql.functions.struct(
        col("x0").as("x")))
      .select("a", "s", "l")
    val rPlain = Seq((1, "y")).toDF("d", "r")
    NonWindowJoinSql.unboundedOuterJoinOn(lStruct, rPlain,
      "a = d AND s.x = 2", "left_outer")
  }

  test("RetractBridge expands update batches into the reference's retract stream") {
    val b = new RetractBridge[String, Long]
    // first sighting: insert only
    assert(b.tag(Seq(("a", 1L))) === Seq((true, "a", 1L)))
    // update: retract(old) BEFORE insert(new) — the join's null-pad
    // flips depend on this order
    assert(b.tag(Seq(("a", 2L), ("b", 5L))) ===
      Seq((false, "a", 1L), (true, "a", 2L), (true, "b", 5L)))
    assert(b.size === 2)
    // drop retracts the remembered value once
    assert(b.drop("a") === Seq((false, "a", 2L)))
    assert(b.drop("a") === Seq.empty)
    assert(b.size === 1)
    // restart rehydration: seed installs last-delivered values without
    // emitting, so the next update retracts correctly
    val b2 = new RetractBridge[String, Long]
    b2.seed(b.snapshot)
    assert(b2.size === 1)
    assert(b2.tag(Seq(("b", 6L))) === Seq((false, "b", 5L), (true, "b", 6L)))
  }

  // NOTE: no end-to-end TTL query here by design — a ProcessingTime-
  // Timeout query under the default trigger spins continuous empty
  // micro-batches to serve its timers (observed: StateStoreCoordinator
  // churn, processAllAvailable never settles), which is the documented
  // reason TTL semantics verify through the VirtualClockHarness; the
  // Column surface's timeout wiring is line-identical to runJoin's.

  test("Column surface: -0.0 and 0.0 double keys join (SQL join-key normalization)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val in1 = MemoryStream[(Double, String)]
    val in2 = MemoryStream[(Double, String)]
    val mat = new Materializer
    val joined = NonWindowJoinSql.unboundedOuterJoin(
      in1.toDS().toDF("k", "l"), in2.toDS().toDF("j", "r"),
      Seq(col("k")), Seq(col("j")), "inner")
    val q = joined.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(row => mat(row.getAs[Boolean]("change"),
          row.getAs[String]("l") + "," + row.getAs[String]("r")))
      }.start()
    try {
      in1.addData((-0.0, "lNegZero"))
      in2.addData((0.0, "rPosZero"))
      q.processAllAvailable()
    } finally q.stop()
    // a plain Spark join normalizes -0.0 == 0.0 (NormalizeFloatingNumbers);
    // the canonical key string must too
    assert(mat.rows === Seq("lNegZero,rPosZero"))
  }

  test("port: JoinITCase testFullJoinWithLeftLocalPred (a=d AND b>=2 AND h=1)") {
    assert(runPort("full_outer", t3Opt(nullAt21 = false),
      t5Opt(nullAtE15 = false),
      Some((l: T3, r: T5) => l._2 >= 2L && r._5 == 1L)) ===
      fullJoinLeftLocalPredExpected.sorted)
  }

  test("join state survives a checkpointed stop/restart (product-encoded schema)") {
    // a left row buffered by one query incarnation must pair with a
    // right row arriving in the NEXT — a real checkpoint round-trip
    // through the state store. The state is product-encoded (maps of
    // concrete row types), so Spark's StateSchemaCompatibilityChecker
    // owns cross-version layout errors; this pins the within-version
    // recovery the schema visibility exists for.
    import scala.jdk.CollectionConverters._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_join_resume").toString
    val in1 = MemoryStream[(Int, String)]
    val in2 = MemoryStream[(Int, String)]
    val got = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Boolean, String, String)]()
    def start() = NonWindowJoin.unboundedOuterJoin[Int, (Int, String), (Int, String)](
      in1.toDS(), in2.toDS(), l => Some(l._1), r => Some(r._1),
      "left_outer")
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[(Boolean, Option[(Int, String)], Option[(Int, String)])],
            _: Long) =>
          df.collect().foreach { case (c, lo, ro) =>
            got.add((c, lo.map(_._2).getOrElse("null"),
              ro.map(_._2).getOrElse("null"))); ()
          }
      }.start()
    val q1 = start()
    try {
      in1.addData((7, "l1"))
      q1.processAllAvailable()
      assert(got.asScala.toSet === Set((true, "l1", "null")))
    } finally q1.stop()
    val q2 = start()
    try {
      in2.addData((7, "r1"))
      q2.processAllAvailable()
      // the restored left pairs: its null-pad retracts, the pair lands
      assert(got.asScala.toSet === Set((true, "l1", "null"),
        (false, "l1", "null"), (true, "l1", "r1")))
    } finally q2.stop()
  }

  test("end-to-end retract composition: two RUNNING update-mode aggregates drive the join across micro-batches") {
    // The reference chains agg→join inside ONE SQL query
    // (stream/table/JoinITCase.scala:497 testLeftJoinWithRetractionInput:
    // the planner feeds DataStreamGroupAggregate's retract stream into
    // DataStreamJoin). Spark cannot place a second stateful operator
    // downstream of an update-mode streaming aggregate in one query, so
    // the achievable composition is foreachBatch: each aggregate runs as
    // a REAL update-mode streaming query; its per-batch updated rows are
    // change-tagged against the previously delivered value
    // (retract(old) + insert(new) — exactly the reference's retract
    // stream) and pushed through joinFn's keyed state held across
    // batches. The materialized multiset must equal the batch answer
    // whatever the micro-batch splits are — asserted under 3 random
    // splits.
    type Agg = (Long, Long) // (key, count)
    import org.apache.spark.sql.functions.col
    val batchExpected: Seq[String] = {
      val lAgg = TestData.t5Rows.toDF("d", "e", "f", "g", "h")
        .groupBy(col("e")).count().withColumnRenamed("count", "cnt_l")
      val rAgg = TestData.t3Rows.toDF("a", "b", "c")
        .groupBy(col("b")).count().withColumnRenamed("count", "cnt_r")
      lAgg.join(rAgg, col("e") === col("b"), "left_outer")
        .select(col("e"), col("cnt_l"), col("cnt_r")).collect()
        .map(r => s"${r.getLong(0)},${r.getLong(1)}," +
          (if (r.isNullAt(2)) "null" else r.getLong(2).toString))
        .toSeq.sorted
    }
    val rnd = new scala.util.Random(421)
    (1 to 3).foreach { run =>
      val harness = new VirtualClockHarness[Long,
        (Boolean, Option[Agg], Option[Agg]),
        NonWindowJoin.SideState[Agg, Agg],
        (Boolean, Option[Agg], Option[Agg])](
        GroupStateTimeout.NoTimeout(),
        NonWindowJoin.joinFn[Long, Agg, Agg]("left_outer"))
      val mat = new Materializer
      val lock = new Object
      val bridgeL = new RetractBridge[Long, Long]
      val bridgeR = new RetractBridge[Long, Long]
      def feed(k: Long, el: (Boolean, Option[Agg], Option[Agg])): Unit =
        harness.input(k, el).foreach { case (c, lo, ro) =>
          mat(c, lo.map(t => s"${t._1},${t._2}").getOrElse("null,null") +
            "," + ro.map(_._2.toString).getOrElse("null"))
        }
      // the library's update→retract bridge: an updated (key, cnt)
      // becomes retract(key, prevCnt) + insert(key, cnt)
      def tagAndFeed(bridge: RetractBridge[Long, Long], isLeft: Boolean)(
          rows: Seq[(Long, Long)]): Unit = lock.synchronized {
        bridge.tag(rows).foreach { case (c, k, cnt) =>
          feed(k, (c,
            if (isLeft) Some((k, cnt)) else None,
            if (isLeft) None else Some((k, cnt))))
        }
      }
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in5 = MemoryStream[(Int, Long, Int, String, Long)]
      val in3 = MemoryStream[(Int, Long, String)]
      val q5 = in5.toDS().toDF("d", "e", "f", "g", "h")
        .groupBy(col("e")).count()
        .writeStream.outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          tagAndFeed(bridgeL, isLeft = true)(
            df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
        }.start()
      val q3 = in3.toDS().toDF("a", "b", "c")
        .groupBy(col("b")).count()
        .writeStream.outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          tagAndFeed(bridgeR, isLeft = false)(
            df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
        }.start()
      try {
        def cuts(n: Int): Seq[Int] = {
          val a = 1 + rnd.nextInt(n - 2)
          val b = a + 1 + rnd.nextInt(n - a - 1)
          Seq(a, b, n)
        }
        val c5 = cuts(TestData.t5Rows.size)
        val c3 = cuts(TestData.t3Rows.size)
        var p5 = 0; var p3 = 0
        c5.zip(c3).foreach { case (u5, u3) =>
          in5.addData(TestData.t5Rows.slice(p5, u5): _*); p5 = u5
          in3.addData(TestData.t3Rows.slice(p3, u3): _*); p3 = u3
          q5.processAllAvailable(); q3.processAllAvailable()
        }
      } finally { q5.stop(); q3.stop() }
      assert(mat.rows === batchExpected, s"splits run $run")
    }
  }

  test("RetractBridge stop/seed/resume: a restarted composition recovers via seed from the sink, unseeded corrupts") {
    // The documented recovery story (RetractBridge.scala scaladoc),
    // driven end-to-end: the bridge's in-memory state does NOT survive
    // a driver restart, so a restarted composition must rebuild it via
    // `seed` from the downstream's materialized state — the sink knows
    // each key's last delivered value. The aggregate query itself
    // resumes from its checkpoint (its counts persist); only the
    // bridge forgets. Seeded: the materialized multiset equals the
    // batch answer. Unseeded (the control): every key updated after
    // the restart emits insert-WITHOUT-retract, so its stale pre-stop
    // row survives next to the new one — the exact anomaly the
    // scaladoc names.
    type Agg = (Long, Long) // (key, count)
    import org.apache.spark.sql.functions.col
    val batchExpected: Seq[String] = TestData.t5Rows.groupBy(_._5)
      .map { case (h, rows) => s"$h,${rows.size},null" }.toSeq.sorted
    val splitAt = 10 // all three h-keys update on BOTH sides of the stop
    def runScenario(seeded: Boolean): Seq[String] = {
      val harness = new VirtualClockHarness[Long,
        (Boolean, Option[Agg], Option[Agg]),
        NonWindowJoin.SideState[Agg, Agg],
        (Boolean, Option[Agg], Option[Agg])](
        GroupStateTimeout.NoTimeout(),
        NonWindowJoin.joinFn[Long, Agg, Agg]("left_outer"))
      val mat = new Materializer
      val lock = new Object
      def feed(k: Long, el: (Boolean, Option[Agg], Option[Agg])): Unit =
        harness.input(k, el).foreach { case (c, lo, ro) =>
          mat(c, lo.map(t => s"${t._1},${t._2}").getOrElse("null,null") +
            "," + ro.map(_._2.toString).getOrElse("null"))
        }
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_bridge_resume").toString
      val in5 = MemoryStream[(Int, Long, Int, String, Long)]
      def start(bridge: RetractBridge[Long, Long]) =
        in5.toDS().toDF("d", "e", "f", "g", "h")
          .groupBy(col("h")).count()
          .writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            lock.synchronized {
              bridge.tag(df.collect()
                .map(r => (r.getLong(0), r.getLong(1))).toSeq)
                .foreach { case (c, k, cnt) =>
                  feed(k, (c, Some((k, cnt)), None))
                }
            }
          }.start()
      val q1 = start(new RetractBridge[Long, Long])
      try {
        in5.addData(TestData.t5Rows.take(splitAt): _*)
        q1.processAllAvailable()
      } finally q1.stop() // driver "restart": the bridge's memory is gone
      val bridge2 = new RetractBridge[Long, Long]
      if (seeded) {
        // rebuild from the SINK's materialized state: one live row per
        // key, "k,cnt,null" — the last delivered value per key
        bridge2.seed(mat.rows.map { row =>
          val p = row.split(",")
          (p(0).toLong, p(1).toLong)
        })
      }
      val q2 = start(bridge2)
      try {
        in5.addData(TestData.t5Rows.drop(splitAt): _*)
        q2.processAllAvailable()
      } finally q2.stop()
      mat.rows
    }
    assert(runScenario(seeded = true) === batchExpected)
    val corrupted = runScenario(seeded = false)
    assert(corrupted !== batchExpected)
    // the anomaly's signature: a key updated across the restart holds
    // BOTH its stale pre-stop count and its final one
    val keysWithTwoRows = corrupted.map(_.split(",")(0))
      .groupBy(identity).collect { case (k, rs) if rs.size > 1 => k }
    assert(keysWithTwoRows.nonEmpty)
  }

  test("non-equi retract/restore protocol rides joinCnt, not side totals") {
    // two rights with the same key, only one passing cond: the left's
    // null-pad must flip on the MATCHING right's arrival/retraction and
    // ignore the non-matching one entirely
    type E = (String, Long)
    val harness = new VirtualClockHarness[Int,
      (Boolean, Option[E], Option[E]), NonWindowJoin.NESideState[E, E],
      (Boolean, Option[E], Option[E])](
      GroupStateTimeout.NoTimeout(),
      NonWindowJoin.joinFnNonEqui[Int, E, E]("left_outer",
        (l, r) => l._2 <= r._2))
    def in(c: Boolean, l: Option[E], r: Option[E]) =
      harness.input(0, (c, l, r)).toList
    val l1 = ("l1", 5L); val rLow = ("rLow", 3L); val rHi = ("rHi", 9L)
    assert(in(true, Some(l1), None) === List((true, Some(l1), None)))
    // non-matching right: no flip, no pair
    assert(in(true, None, Some(rLow)) === List())
    // matching right: flip + pair
    assert(in(true, None, Some(rHi)) ===
      List((false, Some(l1), None), (true, Some(l1), Some(rHi))))
    // retract the non-matching right: silence
    assert(in(false, None, Some(rLow)) === List())
    // retract the matching right: pair retracts, null-pad restored
    assert(in(false, None, Some(rHi)) ===
      List((false, Some(l1), Some(rHi)), (true, Some(l1), None)))
  }

  test("port: JoinITCase testLeftJoinWithRetractionInput (aggregate retract streams drive the core fn)") {
    // leftT = t5 grouped by e → (e, count(d)); rightT = t3 grouped by b →
    // (b, count(a)). Both inputs are RETRACT streams: a bucket's count
    // move arrives as retract(old) + insert(new). Replay the per-row
    // aggregate deltas through the harness; assert the materialized join.
    type Agg = (Long, Long) // (key, count)
    val harness = new VirtualClockHarness[Long,
      (Boolean, Option[Agg], Option[Agg]),
      NonWindowJoin.SideState[Agg, Agg],
      (Boolean, Option[Agg], Option[Agg])](
      GroupStateTimeout.NoTimeout(),
      NonWindowJoin.joinFn[Long, Agg, Agg]("left_outer"))
    val mat = new Materializer
    def feed(k: Long, el: (Boolean, Option[Agg], Option[Agg])): Unit =
      harness.input(k, el).foreach { case (c, lo, ro) =>
        mat(c, lo.map(t => s"${t._1},${t._2}").getOrElse("null,null") + "," +
          ro.map(_._2.toString).getOrElse("null"))
      }
    val lCnt = mutable.Map.empty[Long, Long]
    val rCnt = mutable.Map.empty[Long, Long]
    // interleave the two input streams like the reference's runtime
    val lEvents = TestData.t5Rows.map(_._2) // group key e per arriving row
    val rEvents = TestData.t3Rows.map(_._2) // group key b per arriving row
    val maxLen = math.max(lEvents.size, rEvents.size)
    (0 until maxLen).foreach { i =>
      if (i < lEvents.size) {
        val e = lEvents(i)
        val old = lCnt.getOrElse(e, 0L); val now = old + 1
        lCnt(e) = now
        if (old > 0) feed(e, (false, Some((e, old)), None))
        feed(e, (true, Some((e, now)), None))
      }
      if (i < rEvents.size) {
        val b = rEvents(i)
        val old = rCnt.getOrElse(b, 0L); val now = old + 1
        rCnt(b) = now
        if (old > 0) feed(b, (false, None, Some((b, old))))
        feed(b, (true, None, Some((b, now))))
      }
    }
    val expected = Seq(
      "1,1,1", "2,1,2", "3,1,3", "4,1,4", "5,1,5", "6,1,6", "7,1,null",
      "8,1,null", "9,1,null", "10,1,null", "11,1,null", "12,1,null",
      "13,1,null", "14,1,null", "15,1,null")
    assert(mat.rows === expected.sorted)
  }

  test("idle-state retention drops an idle key's rows silently and re-arms on activity") {
    // the reference's queryConfig minRetention posture: an idle key's
    // state expires on a processing-time timer; cleaning is SILENT (no
    // retraction of already-emitted results), and any activity re-arms
    type E = String
    val ttl = 1000L
    val harness = new VirtualClockHarness[Option[Int],
      (Boolean, Option[E], Option[E]), NonWindowJoin.SideState[E, E],
      (Boolean, Option[E], Option[E])](
      GroupStateTimeout.ProcessingTimeTimeout(),
      NonWindowJoin.guardedFn[Int, E, E, NonWindowJoin.SideState[E, E]](
        leftOuter = true, rightOuter = false, Some(ttl),
        NonWindowJoin.joinFn[Option[Int], E, E]("left_outer", Some(ttl)),
        NonWindowJoin.sweepSideState[E, E]))
    val k = Option(0)
    assert(harness.input(k, (true, Some("l1"), None)) ===
      Seq((true, Some("l1"), None)))
    assert(harness.timerOf(k).isDefined) // idle timer armed
    // activity before expiry re-arms: another left row at t+600
    harness.advanceTo(600)
    harness.input(k, (true, Some("l2"), None))
    harness.advanceTo(1200) // original deadline passed — but re-armed
    assert(harness.stateOf(k).isDefined)
    // full ttl of silence: the timer fires, state drops, NO output
    assert(harness.advanceTo(1700) === Seq.empty)
    assert(harness.stateOf(k).isEmpty)
    // the lefts are gone: a matching right now emits nothing at all
    assert(harness.input(k, (true, None, Some("r1"))) === Seq.empty)
  }

  test("per-row idle retention: an active key sweeps only rows past their own stamps") {
    // the reference's granularity (NonWindowJoin.scala:95-100 per-row
    // (cnt, expiredTime); NonWindowOuterJoin.scala:92-95 clear-after-
    // join): a key kept hot by one side must expire the other side's
    // stale rows individually — after joining them ONE last time —
    // while the hot side's arrivals refresh only their own stamps
    type E = String
    val ttl = 10L
    val harness = new VirtualClockHarness[Option[Int],
      (Boolean, Option[E], Option[E]), NonWindowJoin.SideState[E, E],
      (Boolean, Option[E], Option[E])](
      GroupStateTimeout.ProcessingTimeTimeout(),
      NonWindowJoin.guardedFn[Int, E, E, NonWindowJoin.SideState[E, E]](
        leftOuter = true, rightOuter = false, Some(ttl),
        NonWindowJoin.joinFn[Option[Int], E, E]("left_outer", Some(ttl)),
        NonWindowJoin.sweepSideState[E, E]))
    val k = Option(0)
    // t0: right r1 (stamp 10); no emission on the inner side
    assert(harness.input(k, (true, None, Some("r1"))) === Seq.empty)
    assert(harness.input(k, (true, Some("l1"), None)) ===
      Seq((true, Some("l1"), Some("r1"))))
    harness.advanceTo(5)
    assert(harness.input(k, (true, Some("l2"), None)) ===
      Seq((true, Some("l2"), Some("r1"))))
    // t12: r1 is past its stamp — joins ONE last time, then sweeps
    harness.advanceTo(12)
    assert(harness.input(k, (true, Some("l3"), None)) ===
      Seq((true, Some("l3"), Some("r1"))))
    assert(harness.stateOf(k).get.rights.isEmpty)
    assert(harness.stateOf(k).get.lefts.keySet === Set("l1", "l2", "l3"))
    // t13: the key is still hot, but r1 is gone — fresh left null-pads
    harness.advanceTo(13)
    assert(harness.input(k, (true, Some("l4"), None)) ===
      Seq((true, Some("l4"), None)))
    // only FULL idle fires the timer sweep; every stamp has passed by
    // then, so the key drops (silently, like the reference's onTimer)
    assert(harness.advanceTo(24) === Seq.empty)
    assert(harness.stateOf(k).isEmpty)
  }

  test("per-row retention non-equi: sweeping a preserved row drops its joinCnt entry") {
    type E = (String, Long)
    val ttl = 10L
    val harness = new VirtualClockHarness[Option[Int],
      (Boolean, Option[E], Option[E]), NonWindowJoin.NESideState[E, E],
      (Boolean, Option[E], Option[E])](
      GroupStateTimeout.ProcessingTimeTimeout(),
      NonWindowJoin.guardedFn[Int, E, E, NonWindowJoin.NESideState[E, E]](
        leftOuter = true, rightOuter = false, Some(ttl),
        NonWindowJoin.joinFnNonEqui[Option[Int], E, E]("left_outer",
          (l, r) => l._2 <= r._2, Some(ttl)),
        NonWindowJoin.sweepNESideState[E, E]))
    val k = Option(0)
    val l1 = ("l1", 5L)
    assert(harness.input(k, (true, Some(l1), None)) ===
      Seq((true, Some(l1), None)))
    harness.advanceTo(3)
    assert(harness.input(k, (true, None, Some(("rHi", 9L)))) ===
      Seq((false, Some(l1), None), (true, Some(l1), Some(("rHi", 9L)))))
    assert(harness.stateOf(k).get.leftJoinCnt === Map(l1 -> 1L))
    // t12: l1 (stamp 10) expired — a fresh right joins it once more,
    // then sweeps the row together with its joinCnt entry
    harness.advanceTo(12)
    assert(harness.input(k, (true, None, Some(("rHi2", 9L)))) ===
      Seq((true, Some(l1), Some(("rHi2", 9L)))))
    assert(harness.stateOf(k).get.lefts.isEmpty)
    assert(harness.stateOf(k).get.leftJoinCnt.isEmpty)
  }

  test("non-equi joinCnt seeding counts rows swept in the same pass (reference-faithful inflation)") {
    // Pins the documented quirk at joinFnNonEqui's seeding site: a
    // preserved row inserted while matching rows expire under it seeds
    // its joinCnt from `matched`, which includes the swept rows'
    // multiplicities (they joined one last time — clear-after-join) —
    // and their retractions never arrive, so the count stays inflated
    // and the null-pad re-emission is suppressed after the last LIVE
    // match retracts. The reference's preservedJoin seeds from the same
    // pre-expiry scan; expiry is silent by contract, so this is the
    // same staleness class as any unretracted pre-expiry emission.
    type E = (String, Long)
    val ttl = 10L
    val harness = new VirtualClockHarness[Option[Int],
      (Boolean, Option[E], Option[E]), NonWindowJoin.NESideState[E, E],
      (Boolean, Option[E], Option[E])](
      GroupStateTimeout.ProcessingTimeTimeout(),
      NonWindowJoin.guardedFn[Int, E, E, NonWindowJoin.NESideState[E, E]](
        leftOuter = true, rightOuter = false, Some(ttl),
        NonWindowJoin.joinFnNonEqui[Option[Int], E, E]("left_outer",
          (l, r) => l._2 <= r._2, Some(ttl)),
        NonWindowJoin.sweepNESideState[E, E]))
    val k = Option(0)
    val rOld = ("rOld", 9L)
    val rLive = ("rLive", 9L)
    val l1 = ("l1", 5L)
    // t0: rOld (stamp 10); t5: rLive (stamp 15) — non-preserved side,
    // no emissions
    assert(harness.input(k, (true, None, Some(rOld))) === Seq.empty)
    harness.advanceTo(5)
    assert(harness.input(k, (true, None, Some(rLive))) === Seq.empty)
    // t12: l1 inserts. rOld is past its stamp — it joins one last time
    // and sweeps; matched = 2 seeds the INFLATED joinCnt (the pin)
    harness.advanceTo(12)
    assert(harness.input(k, (true, Some(l1), None)).sortBy(_.toString) ===
      Seq((true, Some(l1), Some(rLive)), (true, Some(l1), Some(rOld)))
        .sortBy((t: (Boolean, Option[E], Option[E])) => t.toString))
    assert(harness.stateOf(k).get.rights.keySet === Set(rLive))
    assert(harness.stateOf(k).get.leftJoinCnt === Map(l1 -> 2L))
    // t13: rLive retracts — l1 now has ZERO live matches, but the
    // inflated count reads 2→1, so the null-pad re-insert that a
    // correct-count seed (1→0) would emit stays suppressed
    harness.advanceTo(13)
    assert(harness.input(k, (false, None, Some(rLive))) ===
      Seq((false, Some(l1), Some(rLive))))
    assert(harness.stateOf(k).get.rights.isEmpty)
    assert(harness.stateOf(k).get.leftJoinCnt === Map(l1 -> 1L))
  }

  test("port: JoinHarnessTest testNonWindowFullJoinWithNonEqualPred (emission script + expiry revival)") {
    // The reference's harness script for the full join with a residual
    // predicate (l.str < r.str), including RETRACT inputs on both sides
    // — the joinCnt path's sharpest scenario. Emissions are compared
    // SORTED per feed (the reference's RowResultSortComparator). Its
    // per-row state-entry/timer counts are harness-internal and not
    // ported; the time-8 tail (rows arriving AFTER retention expired
    // everything re-join from scratch) runs against the same per-row
    // stamps + timer sweep the Dataset surface wires
    // (joinFnNonEqui(ttl) + sweepNESideState). Note: the reference
    // seeds a full join's joinCnt from
    // its flip-inclusive output count (the documented divergence) — in
    // this script that seed is never read before its row retracts, so
    // the expected emissions are identical under the corrected seeding.
    type E = String
    val ttl = 4L
    val harness = new VirtualClockHarness[Option[Int],
      (Boolean, Option[E], Option[E]), NonWindowJoin.NESideState[E, E],
      (Boolean, Option[E], Option[E])](
      GroupStateTimeout.ProcessingTimeTimeout(),
      NonWindowJoin.guardedFn[Int, E, E, NonWindowJoin.NESideState[E, E]](
        leftOuter = true, rightOuter = true, Some(ttl),
        NonWindowJoin.joinFnNonEqui[Option[Int], E, E]("full_outer",
          (l, r) => l < r, Some(ttl)),
        NonWindowJoin.sweepNESideState[E, E]))
    def feed(k: Int, c: Boolean, l: Option[E], r: Option[E]) =
      harness.input(Option(k), (c, l, r)).toList.sortBy(_.toString)
    def exp(rows: (Boolean, String, String)*) =
      rows.toList.map { case (c, l, r) =>
        (c, Option(l).filter(_.nonEmpty), Option(r).filter(_.nonEmpty))
      }.sortBy(_.toString)
    // time 1: two lefts on key 1 — no rights, both null-pad
    assert(feed(1, true, Some("bbb"), None) === exp((true, "bbb", "")))
    assert(feed(1, true, Some("ccc"), None) === exp((true, "ccc", "")))
    // time 2: two rights on key 2 — no lefts, both null-pad
    harness.advanceTo(2)
    assert(feed(2, true, None, Some("bbb")) === exp((true, "", "bbb")))
    assert(feed(2, true, None, Some("ccc")) === exp((true, "", "ccc")))
    // time 3: left aaa on key 2 matches both rights (aaa < bbb/ccc):
    // their null-pads retract; left ddd matches nothing
    harness.advanceTo(3)
    assert(feed(2, true, Some("aaa"), None) === exp(
      (false, "", "bbb"), (false, "", "ccc"),
      (true, "aaa", "bbb"), (true, "aaa", "ccc")))
    assert(feed(2, true, Some("ddd"), None) === exp((true, "ddd", "")))
    // right aaa on key 1 matches nothing (bbb/ccc not < aaa)
    assert(feed(1, true, None, Some("aaa")) === exp((true, "", "aaa")))
    // right ddd matches both lefts: their null-pads retract
    assert(feed(1, true, None, Some("ddd")) === exp(
      (false, "bbb", ""), (false, "ccc", ""),
      (true, "bbb", "ddd"), (true, "ccc", "ddd")))
    // time 4: RETRACT inputs — key 2 loses left aaa (its pairs retract,
    // the rights' null-pads restore), key 1 loses right ddd (mirror)
    harness.advanceTo(4)
    assert(feed(2, false, Some("aaa"), None) === exp(
      (false, "aaa", "bbb"), (false, "aaa", "ccc"),
      (true, "", "bbb"), (true, "", "ccc")))
    assert(feed(1, false, None, Some("ddd")) === exp(
      (false, "bbb", "ddd"), (false, "ccc", "ddd"),
      (true, "bbb", ""), (true, "ccc", "")))
    // retention: both keys idle past the ttl — state expires SILENTLY
    assert(harness.advanceTo(9) === Seq.empty)
    assert(harness.stateOf(Option(1)).isEmpty)
    assert(harness.stateOf(Option(2)).isEmpty)
    // the reference's time-8 tail (here fed at clock 9, past the same
    // expiry): fresh arrivals join from scratch — nothing survived
    assert(feed(1, true, Some("bbb"), None) === exp((true, "bbb", "")))
    assert(feed(2, true, None, Some("bbb")) === exp((true, "", "bbb")))
  }

  test("randomized differential: SQL-text route materializes Spark's batch join of the same ON text") {
    // the text route's classification (key pairs vs residual) is
    // checked against Spark SQL's OWN semantics for the identical
    // condition text: the materialized retract multiset after all
    // input is delivered (across a two-batch split, so state genuinely
    // carries) must equal `lDf.join(rDf, expr(onText), joinType)` —
    // including null join keys (never match, outer-preserved) and
    // local predicates inside the outer-join condition (never pushed
    // as filters)
    import org.apache.spark.sql.functions.{col, lit, expr => sexpr, when => swhen}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(1511)
    val condTexts = Seq("a = d", "a = d AND b = h", "a = d AND b <= h",
      "a = d AND b = 2", "a = d AND c < g")
    // the FULL 20-combo cross product — a fixed random subset would
    // deterministically skip the same combos every run
    val combos = for {
      jt <- Seq("inner", "left_outer", "right_outer", "full_outer")
      ct <- condTexts
    } yield (jt, ct)
    def fmt(row: org.apache.spark.sql.Row): String =
      (0 until row.length).map(i =>
        if (row.isNullAt(i)) "·" else row.get(i).toString).mkString("|")
    combos.foreach { case (joinType, onText) =>
      // sentinel -1 becomes a SQL-null key on both sides
      def rows(n: Int): Seq[(Int, Long, String)] = Seq.fill(n)((
        rnd.nextInt(5) - 1, rnd.nextLong(4), "s" + rnd.nextInt(3)))
      val lRows = rows(12 + rnd.nextInt(8))
      val rRows = rows(12 + rnd.nextInt(8))
      def nullify(df: org.apache.spark.sql.DataFrame, k: String) =
        df.withColumn(k, swhen(col(k) === -1, lit(null)).otherwise(col(k)))
      val lBatch = nullify(lRows.toDF("a", "b", "c"), "a")
      val rBatch = nullify(rRows.toDF("d", "h", "g"), "d")
      val expected = lBatch.join(rBatch, sexpr(onText), joinType)
        .collect().map(fmt).sorted.toSeq
      val in1 = MemoryStream[(Int, Long, String)]
      val in2 = MemoryStream[(Int, Long, String)]
      val got = scala.collection.mutable.Map.empty[String, Int]
      val joined = NonWindowJoinSql.unboundedOuterJoinOn(
        nullify(in1.toDS().toDF("a", "b", "c"), "a"),
        nullify(in2.toDS().toDF("d", "h", "g"), "d"), onText, joinType)
      val q = joined.writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach { row =>
            val key = fmt(org.apache.spark.sql.Row.fromSeq(
              row.toSeq.drop(1))) // drop the change flag
            got.synchronized {
              val n = got.getOrElse(key, 0) +
                (if (row.getBoolean(0)) 1 else -1)
              assert(n >= 0, s"negative multiplicity for $key")
              if (n == 0) got.remove(key) else got.update(key, n)
            }
          }
        }.start()
      try {
        in1.addData(lRows.take(lRows.size / 2): _*)
        in2.addData(rRows.take(rRows.size / 2): _*)
        q.processAllAvailable()
        in1.addData(lRows.drop(lRows.size / 2): _*)
        in2.addData(rRows.drop(rRows.size / 2): _*)
        q.processAllAvailable()
      } finally q.stop()
      val gotRows = got.toSeq.flatMap { case (k, n) => Seq.fill(n)(k) }
        .sorted
      assert(gotRows == expected, s"$joinType ON $onText")
    }
  }

  test("randomized differential: materialized retract stream equals brute-force join " +
      "(join type x cond x duplicates x retractions)") {
    // The strongest equivalence available: for ANY interleaving of
    // inserts and retractions, folding the operator's change stream
    // must land on exactly the join of the SURVIVING row multisets —
    // computed here by an independent brute-force nested loop. Also
    // cross-checks joinFn vs joinFnNonEqui(cond = always-true): the
    // recordNum and joinCnt machineries must materialize identically.
    type E = (Int, Int) // (key, payload)
    val rnd = new scala.util.Random(4111)
    def bruteForce(lefts: Seq[E], rights: Seq[E], lo: Boolean,
        ro: Boolean, cond: (E, E) => Boolean): Map[(Option[E], Option[E]), Int] = {
      val pairs = for {
        l <- lefts; r <- rights
        if l._1 == r._1 && cond(l, r)
      } yield (Option(l), Option(r))
      val lNull = if (lo) lefts.filterNot(l => rights.exists(r =>
        r._1 == l._1 && cond(l, r))).map(l => (Option(l), Option.empty[E]))
      else Nil
      val rNull = if (ro) rights.filterNot(r => lefts.exists(l =>
        l._1 == r._1 && cond(l, r))).map(r => (Option.empty[E], Option(r)))
      else Nil
      (pairs ++ lNull ++ rNull).groupBy(identity).view.mapValues(_.size).toMap
    }
    val conds: Seq[Option[(E, E) => Boolean]] =
      Seq(None, Some((_, _) => true), Some((l, r) => l._2 <= r._2))
    for {
      joinType <- Seq("inner", "left_outer", "right_outer", "full_outer")
      condOpt <- conds
      trial <- 1 to 4
    } {
      val cond = condOpt.getOrElse((_: E, _: E) => true)
      // build a VALID retract stream with retractions INTERLEAVED among
      // inserts (a retraction may target any currently-live row): this
      // exercises insert-after-retract transitions — joinCnt re-flips
      // 0→1→0→1, recordNum re-crossings — that an inserts-then-retracts
      // script never reaches
      val liveL = scala.collection.mutable.ArrayBuffer.empty[E]
      val liveR = scala.collection.mutable.ArrayBuffer.empty[E]
      val script = scala.collection.mutable.ArrayBuffer
        .empty[(Boolean, Option[E], Option[E])]
      val steps = 12 + rnd.nextInt(10)
      (1 to steps).foreach { _ =>
        val leftSide = rnd.nextBoolean()
        val (live, mkEl) =
          if (leftSide) (liveL,
            (c: Boolean, e: E) => (c, Option(e), Option.empty[E]))
          else (liveR,
            (c: Boolean, e: E) => (c, Option.empty[E], Option(e)))
        if (live.nonEmpty && rnd.nextInt(3) == 0) {
          val i = rnd.nextInt(live.size)
          script += mkEl(false, live.remove(i))
        } else {
          val e = (rnd.nextInt(3), rnd.nextInt(4))
          live += e
          script += mkEl(true, e)
        }
      }
      val survL = liveL.toSeq
      val survR = liveR.toSeq
      val harness = condOpt match {
        case None => new VirtualClockHarness[Int,
          (Boolean, Option[E], Option[E]), NonWindowJoin.SideState[E, E],
          (Boolean, Option[E], Option[E])](
          GroupStateTimeout.NoTimeout(), NonWindowJoin.joinFn[Int, E, E](joinType))
        case Some(c) => new VirtualClockHarness[Int,
          (Boolean, Option[E], Option[E]), NonWindowJoin.NESideState[E, E],
          (Boolean, Option[E], Option[E])](
          GroupStateTimeout.NoTimeout(),
          NonWindowJoin.joinFnNonEqui[Int, E, E](joinType, c))
      }
      val got = scala.collection.mutable.Map
        .empty[(Option[E], Option[E]), Int]
      script.foreach { el =>
        val k = el._2.orElse(el._3).get._1
        harness.input(k, el).foreach { case (c, l, r) =>
          val n = got.getOrElse((l, r), 0) + (if (c) 1 else -1)
          assert(n >= 0, s"negative multiplicity for ($l, $r)")
          if (n == 0) got.remove((l, r)) else got.update((l, r), n)
        }
      }
      val (lo, ro) = joinType match {
        case "inner" => (false, false)
        case "left_outer" => (true, false)
        case "right_outer" => (false, true)
        case "full_outer" => (true, true)
      }
      val expected = bruteForce(survL, survR, lo, ro, cond)
      assert(got.toMap === expected,
        s"$joinType cond=${condOpt.isDefined} trial=$trial: " +
          s"script=$script")
    }
  }

  test("randomized differential: un-expired retention is emission-inert (ttl stamps vs none)") {
    // the per-row stamps (round 14) must be PURE BOOKKEEPING until a
    // row actually expires: for ANY interleaving of inserts/retracts
    // on both sides, a ttl-armed fn whose rows never reach their
    // stamps must emit EXACTLY the no-ttl fn's sequence, element by
    // element — including under clock advances that refresh stamps to
    // differing values. Catches any stamp-handling leak into the
    // recordNum/joinCnt/emission machinery.
    type E = (Int, Int)
    val rnd = new scala.util.Random(1447)
    val hugeTtl = 1000L * 1000 * 1000
    for {
      joinType <- Seq("inner", "left_outer", "right_outer", "full_outer")
      useCond <- Seq(false, true)
      trial <- 1 to 3
    } {
      val cond = (l: E, r: E) => l._2 <= r._2
      def mkEqui(ttl: Option[Long]) = new VirtualClockHarness[Int,
        (Boolean, Option[E], Option[E]), NonWindowJoin.SideState[E, E],
        (Boolean, Option[E], Option[E])](
        GroupStateTimeout.NoTimeout(),
        NonWindowJoin.joinFn[Int, E, E](joinType, ttl))
      def mkNE(ttl: Option[Long]) = new VirtualClockHarness[Int,
        (Boolean, Option[E], Option[E]), NonWindowJoin.NESideState[E, E],
        (Boolean, Option[E], Option[E])](
        GroupStateTimeout.NoTimeout(),
        NonWindowJoin.joinFnNonEqui[Int, E, E](joinType, cond, ttl))
      // (base no-ttl, ttl at clock 0, ttl under random clock advances)
      val drives: Seq[(VirtualClockHarness[Int, (Boolean, Option[E],
        Option[E]), _, (Boolean, Option[E], Option[E])], Boolean)] =
        if (useCond) Seq((mkNE(None), false), (mkNE(Some(hugeTtl)), false),
          (mkNE(Some(hugeTtl)), true))
        else Seq((mkEqui(None), false), (mkEqui(Some(hugeTtl)), false),
          (mkEqui(Some(hugeTtl)), true))
      val liveL = scala.collection.mutable.ArrayBuffer.empty[E]
      val liveR = scala.collection.mutable.ArrayBuffer.empty[E]
      val script = scala.collection.mutable.ArrayBuffer
        .empty[(Boolean, Option[E], Option[E])]
      (1 to 14 + rnd.nextInt(8)).foreach { _ =>
        val leftSide = rnd.nextBoolean()
        val (live, mkEl) =
          if (leftSide) (liveL,
            (c: Boolean, e: E) => (c, Option(e), Option.empty[E]))
          else (liveR,
            (c: Boolean, e: E) => (c, Option.empty[E], Option(e)))
        if (live.nonEmpty && rnd.nextInt(3) == 0) {
          val i = rnd.nextInt(live.size)
          script += mkEl(false, live.remove(i))
        } else {
          val e = (rnd.nextInt(3), rnd.nextInt(4))
          live += e
          script += mkEl(true, e)
        }
      }
      val clockSteps = script.indices.map(_ => rnd.nextInt(50).toLong)
      val outs = drives.map { case (h, advance) =>
        var clock = 0L
        script.zip(clockSteps).map { case (el, step) =>
          if (advance) {
            clock += step
            // joinFn never arms timers itself — any output here would
            // mean stamps leaked into the timeout machinery
            assert(h.advanceTo(clock).isEmpty,
              "clock advance produced output without a timer")
          }
          val k = el._2.orElse(el._3).get._1
          h.input(k, el).toList
        }
      }
      assert(outs(1) === outs(0),
        s"$joinType cond=$useCond trial=$trial: ttl@clock0 diverged")
      assert(outs(2) === outs(0),
        s"$joinType cond=$useCond trial=$trial: ttl+advances diverged")
    }
  }

  test("port: JoinHarnessTest testNonWindowLeftJoinWithoutNonEqualPred (pre-expiry emissions)") {
    // the equi left join's per-element script through processing time 4
    // (the time-5+ tail exercises the reference's PER-SIDE retention,
    // which our per-key idle TTL replaces — covered by the TTL tests)
    type E = String
    val harness = new VirtualClockHarness[Int,
      (Boolean, Option[E], Option[E]), NonWindowJoin.SideState[E, E],
      (Boolean, Option[E], Option[E])](
      GroupStateTimeout.NoTimeout(),
      NonWindowJoin.joinFn[Int, E, E]("left_outer"))
    def in(k: Int, c: Boolean, l: Option[E], r: Option[E]) =
      harness.input(k, (c, l, r)).toList.sortBy(_.toString)
    def exp(rows: (Boolean, String, String)*) =
      rows.toList.map { case (c, l, r) =>
        (c, Option(l).filter(_.nonEmpty), Option(r).filter(_.nonEmpty))
      }.sortBy(_.toString)
    in(1, true, Some("aaa"), None)
    in(1, true, Some("aaa"), None)
    in(2, true, Some("bbb"), None)
    // retract one copy of aaa: with no rights its null-pad retracts
    assert(in(1, false, Some("aaa"), None) === exp((false, "aaa", "")))
    // first right: the surviving aaa's null-pad flips, pair emits
    assert(in(1, true, None, Some("Hi1")) === exp(
      (false, "aaa", ""), (true, "aaa", "Hi1")))
    // right retracts: pair retracts, null-pad restores
    assert(in(1, false, None, Some("Hi1")) === exp(
      (false, "aaa", "Hi1"), (true, "aaa", "")))
    assert(in(2, true, None, Some("Hello1")) === exp(
      (false, "bbb", ""), (true, "bbb", "Hello1")))
    // last aaa retracts: its (restored) null-pad goes with it
    assert(in(1, false, Some("aaa"), None) === exp((false, "aaa", "")))
  }

  test("port: JoinHarnessTest testNonWindowLeftJoinWithNonEqualPred (pre-expiry emissions)") {
    // the joinCnt left join (cond: l.str > r.str, ASCII — lowercase
    // beats uppercase) through processing time 4; includes the script's
    // retraction of a right row that was never inserted (state no-op,
    // no matching lefts, no output)
    type E = String
    val harness = new VirtualClockHarness[Int,
      (Boolean, Option[E], Option[E]), NonWindowJoin.NESideState[E, E],
      (Boolean, Option[E], Option[E])](
      GroupStateTimeout.NoTimeout(),
      NonWindowJoin.joinFnNonEqui[Int, E, E]("left_outer", _ > _))
    def in(k: Int, c: Boolean, l: Option[E], r: Option[E]) =
      harness.input(k, (c, l, r)).toList.sortBy(_.toString)
    def exp(rows: (Boolean, String, String)*) =
      rows.toList.map { case (c, l, r) =>
        (c, Option(l).filter(_.nonEmpty), Option(r).filter(_.nonEmpty))
      }.sortBy(_.toString)
    assert(in(1, true, Some("aaa"), None) === exp((true, "aaa", "")))
    assert(in(1, false, Some("aaa"), None) === exp((false, "aaa", "")))
    assert(in(1, true, Some("bbb"), None) === exp((true, "bbb", "")))
    assert(in(1, true, Some("aaa"), None) === exp((true, "aaa", "")))
    assert(in(2, true, Some("bbb"), None) === exp((true, "bbb", "")))
    // Hi1 matches BOTH lefts (aaa > Hi1, bbb > Hi1): both null-pads flip
    assert(in(1, true, None, Some("Hi1")) === exp(
      (false, "aaa", ""), (false, "bbb", ""),
      (true, "aaa", "Hi1"), (true, "bbb", "Hi1")))
    // retracting a right row never inserted: removes nothing, matches
    // nothing (bbb > bbb is false), emits nothing
    assert(in(1, false, None, Some("bbb")) === Nil)
    // ccc matches no left on key 2 (bbb > ccc is false): silence
    assert(in(2, true, None, Some("ccc")) === Nil)
    assert(in(2, true, None, Some("Hello")) === exp(
      (false, "bbb", ""), (true, "bbb", "Hello")))
    // aaa leaves: its pair with Hi1 retracts (bbb's stays)
    assert(in(1, false, Some("aaa"), None) === exp((false, "aaa", "Hi1")))
    // Hi2 raises bbb's joinCnt to 2 — no flip, just the pair
    assert(in(1, true, None, Some("Hi2")) === exp((true, "bbb", "Hi2")))
    assert(in(1, false, None, Some("Hi2")) === exp((false, "bbb", "Hi2")))
    // losing the LAST match (Hi1) restores bbb's null-pad
    assert(in(1, false, None, Some("Hi1")) === exp(
      (false, "bbb", "Hi1"), (true, "bbb", "")))
  }

  test("port: JoinHarnessTest testNonWindowInnerJoinWithRetract (emission script)") {
    // the retract-correct INNER join (NonWindowInnerJoin): needed over
    // a plain Spark join only when the inputs are retract streams — a
    // retracted input row must retract its previously emitted pairs.
    // Exactly three records survive the script (the reference's
    // expected list): state-entry counts are granularity-specific and
    // not ported.
    type E = String
    val harness = new VirtualClockHarness[Int,
      (Boolean, Option[E], Option[E]), NonWindowJoin.SideState[E, E],
      (Boolean, Option[E], Option[E])](
      GroupStateTimeout.NoTimeout(),
      NonWindowJoin.joinFn[Int, E, E]("inner"))
    def in(k: Int, c: Boolean, l: Option[E], r: Option[E]) =
      harness.input(k, (c, l, r)).toList
    assert(in(1, true, Some("aaa"), None) === Nil)  // no null-pads, ever
    assert(in(1, true, Some("aaa"), None) === Nil)
    assert(in(2, true, Some("bbb"), None) === Nil)
    assert(in(1, false, Some("aaa"), None) === Nil) // count 2 -> 1
    // one aaa left: ONE pair out; its retraction takes the pair back
    assert(in(1, true, None, Some("Hi1")) ===
      List((true, Some("aaa"), Some("Hi1"))))
    assert(in(1, false, None, Some("Hi1")) ===
      List((false, Some("aaa"), Some("Hi1"))))
    assert(in(2, true, None, Some("Hello1")) ===
      List((true, Some("bbb"), Some("Hello1"))))
    assert(in(1, false, Some("aaa"), None) === Nil) // last aaa leaves
    // rights arriving against an empty left side emit nothing (inner)
    assert(in(1, true, None, Some("Hi2")) === Nil)
    assert(in(1, false, None, Some("Hi2")) === Nil)
  }

  test("exact retract/restore protocol per element (left join, one key)") {
    type E = String
    val harness = new VirtualClockHarness[Int,
      (Boolean, Option[E], Option[E]), NonWindowJoin.SideState[E, E],
      (Boolean, Option[E], Option[E])](
      GroupStateTimeout.NoTimeout(),
      NonWindowJoin.joinFn[Int, E, E]("left_outer"))
    def in(c: Boolean, l: Option[E], r: Option[E]) =
      harness.input(0, (c, l, r)).toList
    // left first: no match yet → immediate null-pad
    assert(in(true, Some("l1"), None) ===
      List((true, Some("l1"), None)))
    // FIRST right: retract the null-pad, emit the pair
    assert(in(true, None, Some("r1")) ===
      List((false, Some("l1"), None), (true, Some("l1"), Some("r1"))))
    // duplicate right: total is 2 now — just another pair, no flip
    assert(in(true, None, Some("r1")) ===
      List((true, Some("l1"), Some("r1"))))
    // retract one copy: still one left → pair retracts, null-pad stays out
    assert(in(false, None, Some("r1")) ===
      List((false, Some("l1"), Some("r1"))))
    // retract the LAST right: pair retracts AND the null-pad is restored
    assert(in(false, None, Some("r1")) ===
      List((false, Some("l1"), Some("r1")), (true, Some("l1"), None)))
    // retract the left: its null-pad row retracts with it
    assert(in(false, Some("l1"), None) ===
      List((false, Some("l1"), None)))
    // all state gone — the key's state row was removed
    assert(harness.stateOf(0).isEmpty)
  }
}
