package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CompatSpec extends SparkSuite {
  import spark.implicits._

  test("SIMILAR TO translation: %, _, classes, literals") {
    assert(Compat.similarToRegex("abc%") == "^abc.*$")
    assert(Compat.similarToRegex("a_c") == "^a.c$")
    assert(Compat.similarToRegex("a.c") == "^a\\.c$")
    val df = Seq("abcdef", "axc", "a.c", "zzz").toDF("s")
    val got = df.where(Compat.similarTo($"s", "a%c%")).as[String]
      .collect().toSet
    assert(got == Set("abcdef", "axc", "a.c"))
    val lit = df.where(Compat.similarTo($"s", "a.c")).as[String].collect().toSet
    assert(lit == Set("a.c")) // dot is literal in SQL SIMILAR TO
    val cls = df.where(Compat.similarTo($"s", "a[x.]c")).as[String]
      .collect().toSet
    assert(cls == Set("axc", "a.c")) // character class passes through
  }

  test("SIMILAR TO: '^' literal outside classes, negation inside; trailing backslash") {
    // review r16: '^' previously passed through as a regex anchor, so
    // "a^b" could never match its own literal text
    val df = Seq("a^b", "ab", "axc", "abc").toDF("s")
    assert(df.where(Compat.similarTo($"s", "a^b")).as[String]
      .collect().toSet == Set("a^b"))
    // inside a class '^' still negates (shared with regex)
    assert(df.where(Compat.similarTo($"s", "a[^x]c")).as[String]
      .collect().toSet == Set("abc"))
    // a dangling trailing backslash is a literal '\', not an escape of
    // the appended '$' anchor
    assert(Compat.similarToRegex("abc\\") == "^abc\\Q\\\\E$")
    val df2 = Seq("abc\\", "abc$x").toDF("s")
    assert(df2.where(Compat.similarTo($"s", "abc\\")).as[String]
      .collect().toSet == Set("abc\\"))
  }

  test("temporalOverlaps: half-open interval semantics") {
    val df = Seq(
      (1, "2024-01-01 00:00:00", "2024-01-01 02:00:00",
        "2024-01-01 01:00:00", "2024-01-01 03:00:00"), // overlap
      (2, "2024-01-01 00:00:00", "2024-01-01 01:00:00",
        "2024-01-01 01:00:00", "2024-01-01 02:00:00"), // touching: no overlap
      (3, "2024-01-01 00:00:00", "2024-01-01 01:00:00",
        "2024-01-01 02:00:00", "2024-01-01 03:00:00") // disjoint
    ).toDF("id", "s1", "e1", "s2", "e2")
      .select($"id", $"s1".cast("timestamp"), $"e1".cast("timestamp"),
        $"s2".cast("timestamp"), $"e2".cast("timestamp"))
    val got = df.where(Compat.temporalOverlaps($"s1", $"e1", $"s2", $"e2"))
      .select($"id").as[Int].collect().toSet
    assert(got == Set(1))
  }

  test("element() extracts the sole element, null otherwise") {
    val df = Seq(Seq(42), Seq.empty[Int], Seq(1, 2)).toDF("a")
    val got = df.select(Compat.element($"a")).as[Option[Int]].collect().toSeq
    assert(got == Seq(Some(42), None, None))
  }

  test("randInteger stays in [0, n) and is deterministic under a seed") {
    val vals = spark.range(1000)
      .select(Compat.randInteger(10).as("r")).as[Int].collect()
    assert(vals.forall(v => v >= 0 && v < 10))
    assert(vals.distinct.length > 5) // actually varies
  }

  test("cot/bin/log-base builtins behave per reference semantics") {
    val row = spark.range(1).select(
      Compat.cotangent(lit(1.0)).as("cot"),
      Compat.binary(lit(5L)).as("bin"),
      Compat.logBase(2.0, lit(8.0)).as("log2"))
      .as[(Double, String, Double)].head()
    assert(math.abs(row._1 - 1.0 / math.tan(1.0)) < 1e-12)
    assert(row._2 == "101")
    assert(math.abs(row._3 - 3.0) < 1e-12)
  }
}
