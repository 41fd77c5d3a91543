package graft.streaming

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.sql.types.{StructField, StructType}

/** Versioned + schema-fingerprinted envelope for the COLUMN-surface
  * unbounded join's keyed state ([[NonWindowJoinSql]]).
  *
  * The typed Dataset surface persists [[NonWindowJoin.SideState]] /
  * [[NonWindowJoin.NESideState]] PRODUCT-encoded, so its state schema is
  * visible to Spark's StateSchemaCompatibilityChecker and a layout
  * change across a checkpoint fails by name. The Column surface cannot:
  * its state holds generic `Row`s, which only the kryo encoder carries —
  * and a bare kryo column has no runtime-detectable marker, so a resumed
  * checkpoint whose state predates a layout change dies as a raw
  * KryoException deep in the state store (or, worse, a semantic change
  * with an unchanged layout resumes silently wrong). The reference
  * versions its keyed state for exactly this reason
  * (flink-core/.../VersionedIOReadableWritable.java:30 writes a version
  * header every serializer snapshot checks on restore).
  *
  * This envelope restores both guards the product encoding would have
  * given:
  *   - `version` — the state-class format generation; a checkpoint
  *     written by a different generation raises the named
  *     [[JoinStateVersionException]] BEFORE kryo touches the payload;
  *   - `schemaFp` — a fingerprint of the two input schemas; a query
  *     resumed against inputs whose schema changed (same state class,
  *     different `Row` layouts inside it) raises the named
  *     [[JoinStateSchemaException]] instead of deserializing garbage —
  *     serving the role StateSchemaCompatibilityChecker plays for the
  *     typed surface's product-encoded state. DELIBERATELY STRICTER
  *     than that checker: the fingerprint hashes exact field names and
  *     nullability, so a pure rename or nullability flip (which the
  *     positional kryo blobs would tolerate) also fails — the blobs
  *     carry no per-field metadata to validate against, and
  *     exact-schema equality is the conservative check that can never
  *     silently mis-decode.
  * Both columns are product-encoded primitives whose own schema never
  * changes, so the envelope row is readable against any envelope-era
  * checkpoint and the checks run before the opaque blob is interpreted.
  * TIMING: the per-KEY checks run at that key's first post-resume
  * state access (flatMapGroupsWithState exposes no eager whole-store
  * scan at query start). Left alone that made a schema-changed resume
  * fail only when the first pre-change key received an element or
  * fired its timer — a rarely-touched key could fail days later. The
  * driver wiring therefore adds an EAGER SENTINEL
  * ([[NonWindowJoinSql.SentinelKey]]): a reserved key that receives
  * one synthetic element every micro-batch and validates its own
  * envelope on each, so a version- or schema-changed resume fails
  * store-wide at the FIRST post-resume batch even when no data key is
  * touched (the reference posture — VersionedIOReadableWritable
  * checks eagerly at snapshot-restore time — restored).
  * The fingerprint is an MD5 digest of the combined DDL, NOT the DDL
  * itself: the envelope is stored ONCE PER KEY in the state store, and
  * a wide input's DDL (KBs) would dominate small per-key states at
  * scale — the digest is a constant 32 chars per key row. The error
  * message reports the RESUMED query's full DDL (recomputed, not
  * stored) next to the two digests. */
final case class JoinStateEnvelope(version: Int, schemaFp: String,
    blob: Array[Byte])

/** Named restore-time failure: the checkpointed Column-surface join
  * state was written by a different format generation than this build
  * reads. */
final class JoinStateVersionException(val found: Int, val expected: Int,
    what: String) extends RuntimeException(
  s"unbounded-join state '$what' has format version $found but this " +
    s"build reads version $expected; the checkpointed state cannot be " +
    "resumed — restart the query from a fresh checkpoint after " +
    "reprocessing")

/** Named restore-time failure: the checkpointed Column-surface join
  * state was written against different input schemas than the resumed
  * query's — the `Row`s inside the kryo blob would not line up with the
  * current plan (the failure StateSchemaCompatibilityChecker raises for
  * product-encoded state). `found`/`expected` are the stored digests;
  * `expectedDdl` is the RESUMED query's combined input DDL (the
  * checkpointed original is not stored — only its digest is). */
final class JoinStateSchemaException(val found: String,
    val expected: String, what: String, expectedDdl: String)
    extends RuntimeException(
  s"unbounded-join state '$what' was checkpointed against input " +
    s"schemas with fingerprint $found, but this query's inputs " +
    s"fingerprint as $expected —\n  $expectedDdl\n" +
    "the checkpointed state cannot be resumed against the changed " +
    "schema — restart the query from a fresh checkpoint after " +
    "reprocessing")

object JoinStateCodec {

  /** Format generations for the Column surface's two state families.
    * The version space is SHARED so that a query switched between the
    * equi and non-equi variants across a checkpoint (the residual added
    * or dropped — a different state class under the same envelope
    * schema) also fails by name, not in kryo. Bump the changed family
    * to the next FREE integer on any change to its state class's layout
    * or meaning. History: 1 — SideState[Row,Row] (round 15, envelope
    * introduced); 2 — NESideState[Row,Row] (same). */
  val EquiVersion = 1     // NonWindowJoin.SideState[Row, Row]
  val NonEquiVersion = 2  // NonWindowJoin.NESideState[Row, Row]

  /** Canonical DDL of the join's two input schemas: one DDL string
    * over a two-field struct wrapping them (injective — field names
    * and nullability included, no ambiguous concatenation). Carried in
    * error messages; the state stores only its digest. */
  def fingerprintDdl(l: StructType, r: StructType): String =
    StructType(Seq(StructField("l", l), StructField("r", r))).toDDL

  /** The fingerprint the envelope stores: an MD5 digest of
    * [[fingerprintDdl]] — constant 32 chars per key row (the full DDL
    * of a wide input would dominate small per-key states at scale). */
  def fingerprint(l: StructType, r: StructType): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(fingerprintDdl(l, r).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** The envelope's product encoder — stable (int, string, binary)
    * columns, never a kryo-opaque single column. */
  def envelopeEncoder: Encoder[JoinStateEnvelope] =
    Encoders.product[JoinStateEnvelope]

  def enc[S](version: Int, fp: String, s: S): JoinStateEnvelope =
    JoinStateEnvelope(version, fp, CepStateCodec.toBytes(s))

  def dec[S](e: JoinStateEnvelope, version: Int, fp: String,
      what: String, currentDdl: String): S = {
    if (e.version != version)
      throw new JoinStateVersionException(e.version, version, what)
    if (e.schemaFp != fp)
      throw new JoinStateSchemaException(e.schemaFp, fp, what, currentDdl)
    CepStateCodec.fromBytes[S](e.blob)
  }

  /** Adapt an S-typed state-transition function to the envelope-typed
    * state the Column-surface driver actually persists. The view checks
    * version + fingerprint on every read and stamps both on every
    * write; lazy-update semantics pass through (the wrapped fn may call
    * update/remove in a by-name iterator tail — the view delegates
    * immediately to the underlying GroupState, whose changes Spark
    * commits on output exhaustion). `currentDdl` rides along only for
    * the schema-mismatch error message. */
  def versionedFn[K, E, O, S](what: String, version: Int, fp: String,
      currentDdl: String,
      fn: (K, Iterator[E], GroupState[S]) => Iterator[O]):
      (K, Iterator[E], GroupState[JoinStateEnvelope]) => Iterator[O] =
    (k: K, it: Iterator[E], gs: GroupState[JoinStateEnvelope]) =>
      fn(k, it, new JoinStateView[S](gs, version, fp, what, currentDdl))

  /** Adapt a per-row timer sweep to the envelope: decode (checked),
    * sweep, re-encode survivors. */
  def versionedSweep[S](what: String, version: Int, fp: String,
      currentDdl: String, sweep: (S, Long) => Option[S]):
      (JoinStateEnvelope, Long) => Option[JoinStateEnvelope] =
    (e, now) => sweep(dec[S](e, version, fp, what, currentDdl), now)
      .map(enc(version, fp, _))
}

/** [[GroupState]] view decoding/encoding the join envelope at the
  * access boundary (version + fingerprint checks run on every read). */
private[streaming] final class JoinStateView[S](
    u: GroupState[JoinStateEnvelope], version: Int, fp: String,
    what: String, currentDdl: String)
    extends EnvelopeStateView[JoinStateEnvelope, S](u) {
  protected def decode(e: JoinStateEnvelope): S =
    JoinStateCodec.dec[S](e, version, fp, what, currentDdl)
  protected def encode(s: S): JoinStateEnvelope =
    JoinStateCodec.enc(version, fp, s)
}
