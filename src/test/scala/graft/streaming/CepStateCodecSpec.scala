package graft.streaming

import graft.SparkSuite
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, TestGroupState}

/** The versioned envelope every CEP streaming driver persists its keyed
  * state through: roundtrip fidelity, the named wrong-version error on
  * restore (the failure mode that bit twice pre-round-13 as either a raw
  * KryoException or silent resumption), and the view's delegation of the
  * GroupState contract. */
object CepStateCodecSpec {
  case class Ev(user: Long, kind: String, ts: Long)
}

class CepStateCodecSpec extends SparkSuite {
  import CepStateCodecSpec.Ev

  test("envelope roundtrips the arrival state bit-faithfully") {
    val st = Cep.ArrivalState[Ev](nextSeq = 7L,
      partials = Vector.empty,
      matchSeq = 3L, carry = Vector(Ev(1L, "error", 10L)))
    val env = CepStateCodec.enc(CepStateCodec.ArrivalVersion, st)
    assert(env.version == CepStateCodec.ArrivalVersion)
    val back = CepStateCodec.dec[Cep.ArrivalState[Ev]](env,
      CepStateCodec.ArrivalVersion, "spec")
    assert(back == st)
  }

  test("a wrong-version blob raises the named error before kryo decodes") {
    val env = CepStateCodec.enc(CepStateCodec.GroupVersion,
      GroupCep.GStreamState[Ev](Vector.empty, Vector.empty))
    val stale = env.copy(version = CepStateCodec.GroupVersion - 1)
    val ex = intercept[CepStateVersionException] {
      CepStateCodec.dec[GroupCep.GStreamState[Ev]](stale,
        CepStateCodec.GroupVersion, "GroupCep spec")
    }
    assert(ex.found == CepStateCodec.GroupVersion - 1)
    assert(ex.expected == CepStateCodec.GroupVersion)
    assert(ex.getMessage.contains("GroupCep spec"))
    assert(ex.getMessage.contains("fresh checkpoint"))
    // the payload bytes were never interpreted: even a corrupt blob
    // reports the version diff, not a kryo buffer error
    val garbage = CepStateEnvelope(CepStateCodec.GroupVersion + 5,
      Array[Byte](1, 2, 3))
    val ex2 = intercept[CepStateVersionException] {
      CepStateCodec.dec[AnyRef](garbage, CepStateCodec.GroupVersion,
        "corrupt")
    }
    assert(ex2.found == CepStateCodec.GroupVersion + 5)
  }

  test("versionedFn surfaces the stale version through a driver read") {
    val fn: (Long, Iterator[Ev], GroupState[Vector[Long]]) =>
        Iterator[Long] =
      (_, it, state) => {
        val acc = state.getOption.getOrElse(Vector.empty) ++ it.map(_.ts)
        state.update(acc)
        acc.iterator
      }
    val wrapped = CepStateCodec.versionedFn("spec-state",
      CepStateCodec.GroupVersion, fn)
    // fresh key: no state yet, the write lands as the current version
    val fresh = TestGroupState.create[CepStateEnvelope](
      Optional.empty[CepStateEnvelope](), GroupStateTimeout.NoTimeout(),
      0L, Optional.empty[Long](), hasTimedOut = false)
    assert(wrapped(1L, Iterator(Ev(1L, "a", 5L)), fresh).toList == List(5L))
    assert(fresh.get.version == CepStateCodec.GroupVersion)
    assert(CepStateCodec.dec[Vector[Long]](fresh.get,
      CepStateCodec.GroupVersion, "spec-state") ==
      Vector(5L))
    // resumed key whose checkpoint predates this build: named error
    val stale = TestGroupState.create[CepStateEnvelope](
      Optional.of(fresh.get.copy(version = 1)),
      GroupStateTimeout.NoTimeout(), 0L, Optional.empty[Long](),
      hasTimedOut = false)
    intercept[CepStateVersionException] {
      wrapped(1L, Iterator(Ev(1L, "b", 6L)), stale).toList
    }
  }

  test("an open partial survives a checkpointed stop/restart through the envelope") {
    // The scenario the envelope exists for: state written by one query
    // incarnation is restored by the next — a real checkpoint
    // round-trip through the state store, not just an in-memory batch
    // boundary. E{2} opens a partial on the first error; the query is
    // STOPPED, restarted from the same checkpoint, and the second error
    // must complete the match from the restored partial.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import scala.jdk.CollectionConverters._
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_cep_resume").toString
    val input = MemoryStream[(Long, Long, String, Long)]
    val got = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Long, Long, Long)]()
    // the memory sink refuses checkpoint recovery; foreachBatch is the
    // recoverable sink shape (the library's generic-output surface)
    def start() = MatchRecognize(
      input.toDF().toDF("event_id", "ts", "event_type", "user_id"),
      """PARTITION BY user_id
        |ORDER BY ts
        |MEASURES FIRST(E.event_id) AS e1, LAST(E.event_id) AS e2
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (E{2})
        |DEFINE E AS event_type = 'error'""".stripMargin)
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("user_id", "e1", "e2").as[(Long, Long, Long)]
          .collect().foreach(got.add)
      }.start()
    val q1 = start()
    try {
      input.addData((1L, 10L, "error", 1L))
      q1.processAllAvailable()
      assert(got.isEmpty) // partial open, nothing emitted yet
    } finally q1.stop()
    val q2 = start()
    try {
      input.addData((2L, 20L, "error", 1L))
      q2.processAllAvailable()
      assert(got.asScala.toSet === Set((1L, 1L, 2L)))
    } finally q2.stop()
  }
}
