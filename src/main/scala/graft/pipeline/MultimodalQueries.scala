package graft.pipeline

import graft.{Q, QueryModule}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata alongside. The container has no image/audio codecs,
  * so the decode step is a clearly-marked deterministic STUB — what is real
  * (and tested) is the Spark-side plumbing: binary schema, byte slicing into
  * frames, per-frame feature rows, and metadata extraction, all as column
  * expressions that scale without driver involvement.
  *
  * The payload here is the UTF-8 encoding of documents.text standing in for
  * real media bytes (inputs stay driver-generated; only the column is
  * derived).
  */
object MultimodalQueries extends QueryModule {

  private val FrameBytes = 64

  def all: Seq[Q] = Seq(

    // Metadata extraction over a binary payload column: byte length,
    // content hash, STUB-parsed "dimensions" derived from the byte length
    // (a real decoder would read the container header).
    q("qm1_media_meta",
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  md5(text) AS content_md5,
        |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS stub_width,
        |  CAST(octet_length(encode(text)) % 480 AS BIGINT) AS stub_height,
        |  CAST(octet_length(encode(text)) // 64 AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("byte_len"),
          md5(col("text")).as("content_md5"),
          (length(col("payload")) % 640).cast("long").as("stub_width"),
          (length(col("payload")) % 480).cast("long").as("stub_height"),
          floor(length(col("payload")) / FrameBytes).cast("long").as("n_frames"))
        .orderBy(col("doc_id"))
    },

    // Overlapping analysis windows (audio-style: 64-byte frames with 50%
    // hop): each byte offset 0, 32, 64, … starts a frame while a full
    // frame fits. Oracled via generate_series over hop positions.
    q("qm3_overlap_frames",
      """SELECT doc_id, CAST(h AS INTEGER) AS frame_start,
        |  CAST(least(blen - h, 64) AS INTEGER) AS frame_len
        |FROM (SELECT doc_id, octet_length(encode(text)) AS blen FROM documents),
        |  generate_series(0, 100000, 32) g(h)
        |WHERE h + 64 <= blen AND doc_id < 50
        |ORDER BY doc_id, frame_start""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .where(col("doc_id") < 50)
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("blen", length(col("payload")))
        .withColumn("frame_start",
          explode(expr("sequence(0, greatest(blen - 64, 0), 32)")))
        .where(col("frame_start") + 64 <= col("blen"))
        .select(col("doc_id"), col("frame_start"),
          length(expr("substring(payload, frame_start + 1, 64)"))
            .as("frame_len"))
        .orderBy(col("doc_id"), col("frame_start"))
    },

    // Frame sampling: slice the payload into fixed-size frames, keep every
    // 4th frame, and compute a per-frame STUB feature (md5 of the frame
    // bytes — a real pipeline would run the decoder here). Generates rows
    // via an array sequence + explode: fully distributed, no driver loop.
    // Oracle note: DuckDB 1.0 has no BLOB substring, so the oracle slices
    // the VARCHAR — identical bytes because the driver corpus is pure
    // ASCII (verified: octet_length == length for every row at every SF);
    // the Spark side stays byte-true for arbitrary binary payloads.
    q("qm2_frame_sample",
      s"""WITH f AS (SELECT doc_id, text,
         |    octet_length(encode(text)) // $FrameBytes AS n_frames
         |  FROM documents),
         |fr AS (SELECT doc_id, text,
         |    unnest(generate_series(0, CAST(n_frames AS INT) - 1)) AS frame_id
         |  FROM f WHERE n_frames > 0)
         |SELECT doc_id, CAST(frame_id AS INT) AS frame_id,
         |  md5(substring(text, frame_id * $FrameBytes + 1, $FrameBytes)) AS stub_feature,
         |  CAST(length(substring(text, frame_id * $FrameBytes + 1, $FrameBytes)) AS BIGINT) AS frame_len
         |FROM fr WHERE frame_id % 4 = 0
         |ORDER BY doc_id, frame_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("n_frames", floor(length(col("payload")) / FrameBytes).cast("int"))
        .where(col("n_frames") > 0)
        .withColumn("frame_id",
          explode(expr("sequence(0, n_frames - 1)")))
        .where(col("frame_id") % 4 === 0) // sample every 4th frame
        .withColumn("frame_bytes",
          expr(s"substring(payload, frame_id * $FrameBytes + 1, $FrameBytes)"))
        .select(col("doc_id"), col("frame_id"),
          md5(col("frame_bytes")).as("stub_feature"),
          length(col("frame_bytes")).cast("long").as("frame_len"))
        .orderBy(col("doc_id"), col("frame_id"))
    },

    // Cross-media duplicate-frame detection (the content-ID shape): hash
    // every fixed-size frame of every payload, group by hash, report
    // hashes appearing in ≥2 distinct media items with the earliest
    // (doc, frame) occurrence as canonical. ONE partial-aggregated
    // groupBy(hash) over the frame rows — the same fingerprint-keyed
    // shuffle as exact text dedup (qp1), applied to binary content; at
    // 100 TB the reduce side sees one row per (hash, partial). The
    // earliest occurrence packs into MIN(doc_id·10⁵ + frame_id) so the
    // argmin needs no window or second pass.
    q("qm4_duplicate_frames",
      s"""WITH f AS (SELECT doc_id, text,
         |    octet_length(encode(text)) // $FrameBytes AS n_frames
         |  FROM documents),
         |fr AS (SELECT doc_id,
         |    md5(substring(text, CAST(g.i AS INT) * $FrameBytes + 1,
         |        $FrameBytes)) AS frame_md5,
         |    CAST(g.i AS INT) AS frame_id
         |  FROM f, UNNEST(generate_series(0, CAST(n_frames AS INT) - 1))
         |    AS g(i)
         |  WHERE n_frames > 0),
         |agg AS (SELECT frame_md5,
         |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |    CAST(COUNT(*) AS BIGINT) AS n_occur,
         |    CAST(MIN(doc_id * 100000 + frame_id) AS BIGINT) AS fk
         |  FROM fr GROUP BY frame_md5)
         |SELECT frame_md5, n_docs, n_occur,
         |  fk // 100000 AS first_doc, fk % 100000 AS first_frame
         |FROM agg WHERE n_docs >= 2
         |ORDER BY frame_md5""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("n_frames",
          floor(length(col("payload")) / FrameBytes).cast("int"))
        .where(col("n_frames") > 0)
        .withColumn("frame_id", explode(expr("sequence(0, n_frames - 1)")))
        .select(col("doc_id"), col("frame_id"),
          md5(expr(s"substring(payload, frame_id * $FrameBytes + 1, " +
            s"$FrameBytes)")).as("frame_md5"))
        .groupBy(col("frame_md5"))
        .agg(count_distinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occur"),
          min(col("doc_id") * 100000 + col("frame_id")).as("fk"))
        .where(col("n_docs") >= 2)
        .select(col("frame_md5"), col("n_docs"), col("n_occur"),
          expr("fk div 100000").as("first_doc"),
          expr("fk % 100000").as("first_frame"))
        .orderBy(col("frame_md5"))
    },

    // Scene-cut detection (round 15) — the clip-boundary primitive a
    // video curation pipeline runs before sampling training clips: a
    // per-frame STUB energy (sum of frame byte values — a real decoder
    // would produce a luma histogram), the frame-to-frame |delta| via
    // LAG within each media item, cuts where the delta jumps, and a
    // per-item summary. Scale shape: frames explode distributed (array
    // sequence, the qm2 pattern), energy is a pure column expression,
    // the LAG window partitions BY media item (bounded by the item's
    // own frame count — never corpus-wide), and the summary is one
    // partial-aggregated groupBy. All-integer math throughout. The
    // energy reads the ASCII stand-in via string slicing on both
    // engines (the qm2 byte==char note); a real pipeline slices bytes.
    q("qm5_scene_cuts",
      s"""WITH f AS (SELECT doc_id, text,
         |    octet_length(encode(text)) // $FrameBytes AS n_frames
         |  FROM documents),
         |fr AS (SELECT doc_id, CAST(g.i AS INT) AS frame_id,
         |    CAST(list_aggregate(list_transform(
         |        generate_series(1, $FrameBytes),
         |        j -> ord(substr(substring(text,
         |          CAST(g.i AS INT) * $FrameBytes + 1, $FrameBytes),
         |          j, 1))), 'sum') AS BIGINT) AS energy
         |  FROM f, UNNEST(generate_series(0, CAST(n_frames AS INT) - 1))
         |    AS g(i)
         |  WHERE n_frames > 0),
         |d AS (SELECT doc_id, energy - lag(energy) OVER (
         |    PARTITION BY doc_id ORDER BY frame_id) AS delta
         |  FROM fr)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
         |  CAST(COALESCE(SUM(CASE WHEN abs(delta) >= 300 THEN 1 END), 0)
         |    AS BIGINT) AS n_cuts,
         |  CAST(COALESCE(MAX(abs(delta)), 0) AS BIGINT) AS max_delta
         |FROM d GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val fr = t(s, d, "documents")
        .withColumn("n_frames",
          floor(length(col("text").cast("binary")) / FrameBytes).cast("int"))
        .where(col("n_frames") > 0)
        .withColumn("frame_id", explode(expr("sequence(0, n_frames - 1)")))
        .withColumn("energy", expr(
          s"""aggregate(transform(sequence(1, $FrameBytes),
             |  j -> CAST(ascii(substring(
             |    substring(text, frame_id * $FrameBytes + 1, $FrameBytes),
             |    j, 1)) AS BIGINT)), 0L, (a, x) -> a + x)""".stripMargin))
      fr.withColumn("delta", col("energy") - lag(col("energy"), 1)
          .over(Window.partitionBy("doc_id").orderBy("frame_id")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"),
          coalesce(sum(when(abs(col("delta")) >= 300, 1L)), lit(0L))
            .as("n_cuts"),
          coalesce(max(abs(col("delta"))), lit(0L)).as("max_delta"))
        .orderBy("doc_id")
    }
  )
}
