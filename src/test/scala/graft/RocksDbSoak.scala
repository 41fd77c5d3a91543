package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** RocksDB state store at REALISTIC key cardinality: RocksDbStateSpec
  * proves the provider engages; this soak measures it where it matters —
  * a streaming exact-dedup holding ~1M keys of state, under both
  * providers, same JVM, same data. Run:
  *   Test/runMain graft.RocksDbSoak [nKeys]
  * Prints per-batch wall times, state rows, and state memory metrics;
  * the numbers + the flip-the-knob recommendation are recorded in
  * ENGINE.md ("Scale design notes").
  */
object RocksDbSoak {
  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"

  def main(args: Array[String]): Unit = {
    val nKeys = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = Engine.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // streaming exact-dedup: one Boolean-ish state row per key ever seen
    val dedupFn = (k: Long, it: Iterator[Long], st: GroupState[Long]) => {
      val n = it.size
      if (st.exists) { st.update(st.get + n); Iterator.empty }
      else { st.update(n.toLong); Iterator.single(k) }
    }

    def run(provider: Option[String]): (Seq[Double], Long, Map[String, Long]) = {
      provider match {
        case Some(p) => spark.conf.set(ProviderConf, p)
        case None => spark.conf.unset(ProviderConf)
      }
      val input = MemoryStream[Long]
      val deduped = input.toDS()
        .groupByKey(identity)
        .flatMapGroupsWithState[Long, Long](
          OutputMode.Append(), GroupStateTimeout.NoTimeout())(dedupFn)
      val name = s"soak_${provider.fold("hdfs")(_ => "rocksdb")}"
      val q = deduped.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        val half = nKeys / 2
        val batches = Seq(
          (0L until half),            // new keys
          (half.toLong until nKeys),  // new keys → full cardinality
          (0L until half),            // all hits against 1M-key state
          (half.toLong until nKeys))  // all hits
        val times = batches.map { b =>
          input.addData(b)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }
        val firsts = spark.table(name).count()
        require(firsts == nKeys, s"dedup broke: $firsts != $nKeys")
        val so = q.lastProgress.stateOperators.apply(0)
        val mem = Map(
          "numRowsTotal" -> so.numRowsTotal,
          "memoryUsedBytes" -> so.memoryUsedBytes)
        val custom = so.customMetrics
        import scala.jdk.CollectionConverters._
        val extra = custom.keySet().asScala.toSeq.sorted
          .filter(k => k.contains("Memory") || k.contains("SstFile")
            || k.contains("loadedMap"))
          .map(k => k -> custom.get(k).longValue()).toMap
        (times, so.numRowsTotal, mem ++ extra)
      } finally q.stop()
    }

    // HDFS-backed (default) first, then RocksDB — conf is read per query
    val (tH, rowsH, memH) = run(None)
    val (tR, rowsR, memR) = run(Some(Engine.RocksDbProvider))
    require(memR.keys.exists(_.toLowerCase.contains("memory")), "")
    println(f"[soak] keys=$nKeys")
    println(f"[soak] hdfs    batches ${tH.map(t => f"$t%.2f").mkString(" ")}" +
      f" total ${tH.sum}%.2fs stateRows $rowsH mem $memH")
    println(f"[soak] rocksdb batches ${tR.map(t => f"$t%.2f").mkString(" ")}" +
      f" total ${tR.sum}%.2fs stateRows $rowsR mem $memR")
  }
}
