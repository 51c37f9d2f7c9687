package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** SURVEY.md §2.J — multimodal-column operators.
  *
  * Model: media is an opaque `binary` column + typed metadata struct,
  * exactly as a 100-TB training-data pipeline would carry images/audio
  * (the bytes travel through shuffles untouched; feature extraction is a
  * per-partition map, no shuffle). The container has no image/audio
  * codecs, so `FakeDecoder` below is a clearly-marked deterministic stub
  * — the Spark-side plumbing (schema, batch-wise partition iteration,
  * typed output) is real and tested.
  */
object Multimodal extends OpModule {
  import Det._

  /** Decoded-media feature row (what a real image decode would yield). */
  case class MediaFeatures(doc_id: Long, byte_len: Int, width: Int,
      height: Int, channels: Int, checksum: Long)

  /** STUB: deterministic fake decoder standing in for a codec.
    * A real implementation would parse the container format; this derives
    * "dimensions" from a rolling hash of the payload bytes so output is
    * reproducible. */
  object FakeDecoder {
    def decode(docId: Long, bytes: Array[Byte]): MediaFeatures = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      val pos = h & Long.MaxValue
      MediaFeatures(docId, bytes.length,
        width = (pos % 1920L).toInt + 1,
        height = ((pos / 1920L) % 1080L).toInt + 1,
        channels = (pos % 3L).toInt + 1,
        checksum = pos % 1000000007L)
    }
  }

  /** Binary plumbing (oracled): text → UTF-8 bytes as the opaque payload;
    * byte length + hex head are engine-portable byte-level features. */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "documents")
      .select($"doc_id",
        encode($"text", "UTF-8").as("payload"),
        $"lang")
      .select($"doc_id",
        octet_length($"payload").as("byte_len"),
        lower(hex(substring($"payload", 1, 8))).as("head_hex"),
        $"lang")
      .orderBy($"doc_id")
  }

  /** Per-partition typed decode over the opaque payload (mapPartitions —
    * batchwise, no shuffle; the shape a real codec UDF would have).
    * Stubbed decoder ⇒ no SQL oracle; covered by ScalaTest. */
  def multimodalDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => FakeDecoder.decode(id, bytes) })
      .toDF()
      .orderBy($"doc_id")
  }

  /** Fixed-size chunking of the opaque binary payload — the stage that
    * splits large media blobs into embedder-sized pieces. 256-byte
    * chunks, per chunk: index, exact length, and the first 16 bytes as
    * hex (a content witness). Chunk count via exact integer arithmetic
    * (`(len + 255) div 256` — no float ceil). The payload is substring'd
    * per chunk row (the shape a 100-TB chunker has: bytes stay on the
    * executor, one Generate, no shuffle). DuckDB has no BLOB substring,
    * so the oracle slices the hex encoding at doubled offsets. */
  /** One row per `stride`-byte window of the binary payload:
    * (doc_id, idx) with payload/blen carried — the shared executor-
    * local Generate behind chunking and frame sampling. Window count
    * via exact integer arithmetic (no float ceil); empty payloads are
    * filtered FIRST because Spark's sequence(0, -1) would DESCEND,
    * emitting spurious indices 0 and -1 where the oracle's range(0, 0)
    * emits none. The window-slice shape must stay in lockstep with the
    * oracles' doubled-offset hex slicing (DuckDB has no BLOB
    * substring) — one definition keeps both ops and both oracles from
    * drifting. */
  private def stridedWindows(s: SparkSession, dir: String, stride: Long): DataFrame = {
    import s.implicits._
    val payload = encode($"text", "UTF-8")
    Tables.t(s, dir, "documents")
      .select($"doc_id", payload.as("payload"),
        octet_length(payload).as("blen"))
      .filter($"blen" > 0)
      .select($"doc_id", $"payload", $"blen",
        explode(sequence(lit(0L),
          expr(s"(blen + ${stride - 1}) div $stride") - 1L)).as("idx"))
  }

  def multimodalChunks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    stridedWindows(s, dir, 256L)
      .select($"doc_id", $"idx".as("chunk_id"),
        least(lit(256L), $"blen" - $"idx" * 256L).cast("int").as("chunk_len"),
        lower(hex(substring($"payload",
          ($"idx" * 256L + 1L).cast("int"), lit(16))))
          .as("head_hex"))
      .orderBy($"doc_id", $"chunk_id")
  }

  /** Strided frame sampling of the opaque binary payload — the
    * video/audio analogue of sampling every Nth frame at a fixed rate
    * instead of decoding the whole stream. One 8-byte "frame" every
    * 512 bytes (offsets 0, 512, 1024, …), each with its exact offset
    * and hex content witness. Same executor-local Generate shape as
    * chunking: bytes never shuffle, sampling cost is O(frames) not
    * O(bytes). Oracle slices the hex encoding at doubled offsets
    * (DuckDB has no BLOB substring). */
  def multimodalFramesample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    stridedWindows(s, dir, 512L)
      .select($"doc_id", $"idx".as("frame_id"),
        ($"idx" * 512L).as("frame_off"),
        lower(hex(substring($"payload",
          ($"idx" * 512L + 1L).cast("int"), lit(8))))
          .as("frame_hex"))
      .orderBy($"doc_id", $"frame_id")
  }

  /** documents ⋈ embeddings (1:1 on doc_id=vec_id) → struct metadata +
    * vector column; per-label aggregate profile. */
  def multimodalJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.t(s, dir, "documents")
    val e = Tables.t(s, dir, "embeddings")
    d.join(e, $"doc_id" === $"vec_id")
      .select($"label",
        struct($"lang", $"source", $"n_chars").as("text_meta"),
        $"embedding")
      .groupBy($"label")
      .agg(
        count(lit(1)).as("n"),
        round(sum($"text_meta.n_chars").cast("double") / count(lit(1)), 2)
          .as("avg_chars"),
        countDistinct($"text_meta.lang").as("n_langs"))
      .orderBy($"label")
  }

  /** Resize PLANNING over decoded media — the last stage of the
    * decode / feature-extract / resize / frame-sample quartet. The
    * pixel decode is the declared [[FakeDecoder]] stub; the resize
    * math is REAL and exact: aspect-fit into a 224×224 box via pure
    * integer arithmetic (`dim·224 div max(w,h)`, floor — no float
    * scale factor whose rounding could disagree across executors),
    * identity for media already inside the box, scale in integer ppm.
    * Same mapPartitions shape as decode: bytes stay executor-local,
    * no shuffle; the output is the (out_w, out_h) plan a real
    * resampler kernel would execute. Stub decoder ⇒ no SQL oracle;
    * aspect/bound/idempotence laws in ScalaTest. */
  case class ResizePlan(doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, scale_ppm: Long)

  def multimodalResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val box = 224L
    Tables.t(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = FakeDecoder.decode(id, bytes)
        val w = m.width.toLong
        val h = m.height.toLong
        val mx = math.max(w, h)
        if (mx <= box)
          ResizePlan(id, m.width, m.height, m.width, m.height, 1000000L)
        else
          ResizePlan(id, m.width, m.height,
            math.max(1L, w * box / mx).toInt,
            math.max(1L, h * box / mx).toInt,
            box * 1000000L / mx)
      })
      .toDF()
      .orderBy($"doc_id")
  }

  /** Content-addressed dedup sizing — the CAS-store planning readout a
    * multimodal lake runs before ingest: per source, how many binary
    * assets collapse to how many UNIQUE payloads (keyed by md5 of the
    * bytes — the content-address), total vs deduplicated bytes, and
    * the integer-ppm storage savings. The byte-level twin of
    * `q_dedup_exact` (which keys on text): here the payload is the
    * opaque binary column, so the same op covers images/audio verbatim
    * at 100 TB — hash travels through the shuffle, bytes stay put.
    *
    * Scale shape: one map-side md5 projection (bytes never shuffle —
    * only the 16-byte digest and the length), one (source, digest)
    * combinable aggregate, one O(sources) rollup. */
  def multimodalDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = Tables.t(s, dir, "documents")
      .select($"source",
        md5(encode($"text", "UTF-8")).as("digest"),
        octet_length(encode($"text", "UTF-8")).cast("long").as("blen"))
    assets.groupBy($"source", $"digest")
      .agg(count(lit(1)).as("n"), min($"blen").as("blen"))
      .groupBy($"source")
      .agg(sum($"n").as("n_assets"),
        count(lit(1)).as("n_unique"),
        sum($"n" * $"blen").as("bytes_total"),
        sum($"blen").as("bytes_unique"))
      .select($"source", $"n_assets", $"n_unique", $"bytes_total",
        $"bytes_unique",
        expr("(bytes_total - bytes_unique) * 1000000 div bytes_total")
          .as("savings_ppm"))
      .orderBy($"source")
  }

  val queries: Map[String, Q] = Map(
    "q_multimodal_dedup" -> (multimodalDedup _),
    "q_multimodal_resize" -> (multimodalResize _),
    "q_multimodal_features" -> (multimodalFeatures _),
    "q_multimodal_decode" -> (multimodalDecode _),
    "q_multimodal_chunks" -> (multimodalChunks _),
    "q_multimodal_framesample" -> (multimodalFramesample _),
    "q_multimodal_join" -> (multimodalJoin _)
  )

  val oracle: Map[String, String] = Map(
    "q_multimodal_dedup" ->
      """WITH assets AS (
        |  SELECT source, md5(text) AS digest,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS blen
        |  FROM documents),
        |uniq AS (
        |  SELECT source, digest, CAST(COUNT(*) AS BIGINT) AS n,
        |    MIN(blen) AS blen
        |  FROM assets GROUP BY 1, 2)
        |SELECT source, CAST(SUM(n) AS BIGINT) AS n_assets,
        |  CAST(COUNT(*) AS BIGINT) AS n_unique,
        |  CAST(SUM(n * blen) AS BIGINT) AS bytes_total,
        |  CAST(SUM(blen) AS BIGINT) AS bytes_unique,
        |  (CAST(SUM(n * blen) AS BIGINT) - CAST(SUM(blen) AS BIGINT))
        |    * 1000000 // CAST(SUM(n * blen) AS BIGINT) AS savings_ppm
        |FROM uniq GROUP BY source ORDER BY source""".stripMargin,
    "q_multimodal_framesample" ->
      """WITH p AS (
        |  SELECT doc_id, hex(encode(text)) AS payload_hex,
        |    octet_length(encode(text)) AS blen
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, blen,
        |    UNNEST(range(0, (blen + 511) // 512)) AS frame_id, payload_hex
        |  FROM p)
        |SELECT doc_id, frame_id, frame_id * 512 AS frame_off,
        |  lower(substring(payload_hex, CAST(frame_id * 1024 + 1 AS INTEGER), 16))
        |    AS frame_hex
        |FROM f ORDER BY doc_id, frame_id""".stripMargin,
    "q_multimodal_chunks" ->
      """WITH p AS (
        |  SELECT doc_id, hex(encode(text)) AS payload_hex,
        |    octet_length(encode(text)) AS blen
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, blen,
        |    UNNEST(range(0, (blen + 255) // 256)) AS chunk_id, payload_hex
        |  FROM p)
        |SELECT doc_id, chunk_id,
        |  CAST(least(256, blen - chunk_id * 256) AS INTEGER) AS chunk_len,
        |  lower(substring(payload_hex, CAST(chunk_id * 512 + 1 AS INTEGER), 32)) AS head_hex
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q_multimodal_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
        |  lower(substring(hex(encode(text)), 1, 16)) AS head_hex,
        |  lang
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_join" ->
      """SELECT label, COUNT(*) AS n,
        |  ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 2) AS avg_chars,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |GROUP BY label ORDER BY label""".stripMargin
  )
}
