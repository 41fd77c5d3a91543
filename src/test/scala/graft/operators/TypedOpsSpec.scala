package graft.operators

import graft.{Engine, SparkSuite}
import org.apache.spark.sql.functions._

/** Typed Dataset parity with the reference's DataSet/DataStream functional
  * surface (SURVEY.md §2.3/§2.5/§2.7): map, flatMap, mapPartitions
  * (mapPartition, DataSet.java:237), groupByKey.reduceGroups (reduce/
  * reduceGroup, DataSet.java:443/464), cogroup (coGroup, DataSet.java:1009),
  * sortWithinPartitions (sortPartition, DataSet.java:1401), limit/first
  * (first(n), DataSet.java:574) and summary() (DataSetUtils.summarize).
  */
case class N(key: Int, name: String)

class TypedOpsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val nations =
    Engine.table(spark, sf, "nation")
      .select($"n_nationkey".as("key"), $"n_name".as("name")).as[N]

  test("typed map / flatMap / filter") {
    val m = nations.map(n => n.key * 2).collect().sorted
    assert(m.toSeq == nations.collect().map(_.key * 2).sorted.toSeq)
    val f = nations.flatMap(n => n.name.split("")).count()
    assert(f == nations.collect().map(_.name.length).sum)
    assert(nations.filter(_.key < 5).count() == 5)
  }

  test("mapPartitions sees each row exactly once") {
    val counted = nations.mapPartitions(it => Iterator(it.size)).collect().sum
    assert(counted == nations.count())
  }

  test("groupByKey + reduceGroups + mapGroups") {
    val byMod = nations.groupByKey(_.key % 3)
    val reduced = byMod.reduceGroups((a, b) => if (a.key > b.key) a else b)
      .collect().toMap
    assert(reduced(0).key == nations.collect().map(_.key).filter(_ % 3 == 0).max)
    val sizes = byMod.mapGroups((k, it) => (k, it.size)).collect().toMap
    assert(sizes.values.sum == nations.count())
  }

  test("cogroup pairs groups from two datasets (coGroup parity)") {
    val odd = nations.filter(_.key % 2 == 1).groupByKey(_.key % 3)
    val even = nations.filter(_.key % 2 == 0).groupByKey(_.key % 3)
    val out = odd.cogroup(even) { (k, l, r) =>
      Iterator((k, (l.size, r.size)))
    }.collect().toMap
    val byKey = nations.collect().groupBy(_.key % 3)
    byKey.foreach { case (k, rows) =>
      val (l, r) = out(k)
      assert(l == rows.count(_.key % 2 == 1) && r == rows.count(_.key % 2 == 0))
    }
  }

  test("sortWithinPartitions orders rows inside each partition") {
    val parted = nations.repartition(3, $"key" % 3)
      .sortWithinPartitions($"name")
    val ok = parted.mapPartitions { it =>
      val names = it.map(_.name).toSeq
      Iterator(names == names.sorted)
    }.collect()
    assert(ok.forall(identity))
  }

  test("summary() provides per-column statistics (summarize parity)") {
    val s = Engine.table(spark, sf, "lineitem")
      .select($"l_quantity", $"l_extendedprice").summary("count", "min", "max")
    val rows = s.collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("count", "min", "max"))
    assert(rows("count").getString(1).toLong ==
      Engine.table(spark, sf, "lineitem").count())
  }

  test("union of typed datasets keeps duplicates; distinct removes them") {
    val u = nations.union(nations)
    assert(u.count() == 2 * nations.count())
    assert(u.distinct().count() == nations.count())
  }
}
