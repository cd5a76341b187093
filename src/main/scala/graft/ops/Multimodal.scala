package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, and per-partition batch "decode" — the Spark-side
  * architecture a real image/audio pipeline needs (schema, partitioning,
  * batch shape), with the actual codec STUBBED because no media libraries
  * exist in this environment.
  *
  * The decode path mirrors the `mapInPandas` batch contract: the decoder
  * receives an iterator of records per partition (so a real implementation
  * amortizes model/codec initialization per partition, not per row), and
  * emits one typed feature row per record. Swap `StubDecoder` for a real
  * JNI/FFI codec without touching the plumbing.
  */
object Multimodal {

  /** One media record: payload is opaque bytes + content metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte],
                         media_type: String)

  /** Decoder output: deterministic features per payload. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, first_byte: Int,
                           last_byte: Int, byte_sum_mod: Long)

  /** Decoder contract: one partition's records in, one feature row each out.
    * Real codecs initialize per-partition state here (decoder handles, GPU
    * context) before consuming the iterator.
    */
  trait Decoder extends Serializable {
    def decodePartition(records: Iterator[MediaRecord]): Iterator[MediaFeatures]
  }

  /** ======= STUB =======
    * Deterministic fake "decode": byte-level statistics standing in for a
    * real image/audio feature extractor (libraries unavailable in this
    * container). The batch shape, schema, and partition amortization are
    * real; only the math inside is fake.
    */
  object StubDecoder extends Decoder {
    def decodePartition(records: Iterator[MediaRecord]): Iterator[MediaFeatures] =
      records.map { r =>
        val b = r.payload
        var sum = 0L
        var i = 0
        while (i < b.length) { sum += (b(i) & 0xff); i += 1 }
        MediaFeatures(r.doc_id, b.length.toLong,
          if (b.isEmpty) -1 else b(0) & 0xff,
          if (b.isEmpty) -1 else b(b.length - 1) & 0xff,
          sum % 997L)
      }
  }

  /** Wrap the documents table as a media table: text bytes standing in for
    * an image/audio payload (binary column + metadata columns).
    */
  def toMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("text/plain").as("media_type"))

  /** Media table from FILES on storage — the real 100 TB ingestion shape:
    * `binaryFile` rows (path, length, content) become MediaRecords with a
    * stable id (xxhash64 of the path — deterministic across runs, unlike
    * a zip-with-index) and a media type from the file extension. Feeds
    * [[extractFeatures]]/[[sampleFrames]] unchanged.
    */
  def fromBinaryFiles(files: DataFrame): DataFrame =
    files.select(
      xxhash64(col("path")).as("doc_id"),
      col("content").as("payload"),
      lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
        .as("media_type"))

  /** Payload-level metadata without decoding: size + content digest —
    * pure projection, codegen'd, no shuffle.
    */
  def payloadMetadata(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      sha2(col("payload"), 256).as("sha256"))

  /** [[payloadMetadata]] plus REAL container metadata: format and pixel
    * dimensions parsed from the payload's header bytes by the native
    * [[graft.functions.MediaDims]] expression (PNG IHDR, JPEG SOF walk,
    * GIF logical screen, BMP DIB — no media library involved). Unlike the
    * stubbed feature decoder, this column is the genuine article: the
    * same bytes any image tool would read, NULL for non-media payloads.
    * One codegen projection, no shuffle, no per-row driver work.
    */
  def headerMetadata(media: DataFrame): DataFrame = {
    val dims = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.MediaDims(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("payload"))))
    media.select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("sha256"),
        dims.as("dims"))
      .select(col("doc_id"), col("n_bytes"), col("sha256"),
        col("dims.format").as("format"),
        col("dims.width").cast("long").as("width"),
        col("dims.height").cast("long").as("height"))
  }

  /** Deterministic header fixtures — hand-assembled minimal headers of
    * each container the decoder knows, plus one unrecognizable payload.
    * Negative doc_ids keep them disjoint from any real corpus. These give
    * the oracle gate REAL bytes with hand-computable expected dimensions.
    */
  def fixtureMedia(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // PNG 640x480: signature + IHDR(len 13) + 5 param bytes + CRC
      (-5L, "89504E470D0A1A0A0000000D4948445200000280000001E0080600000000000000",
        "image/png"),
      // JPEG 320x240: SOI + APP0(JFIF) + SOF0(8-bit, 3 components) + EOI
      (-4L, "FFD8FFE000104A46494600010100000100010000" +
        "FFC000110800F0014003012200021101031101FFD9", "image/jpeg"),
      // GIF89a 320x200 logical screen + flags/background/aspect
      (-3L, "4749463839614001C800F70000", "image/gif"),
      // BMP 100x50: BM + file header + BITMAPINFOHEADER prefix
      (-2L, "424D000000000000000036000000280000006400000032000000" +
        "01001800", "image/bmp"),
      // no known magic → NULL struct
      (-1L, "DEADBEEF00", "application/octet-stream")
    ).toDF("doc_id", "hex", "media_type")
      .select(col("doc_id"), unhex(col("hex")).as("payload"),
        col("media_type"))
  }

  /** Audio-header metadata — the audio sibling of [[headerMetadata]]:
    * format, channels, sample rate, bit depth, duration parsed from the
    * payload's leading bytes by the native codegen expression
    * ([[graft.functions.AudioMeta]]: WAV chunk walk, FLAC STREAMINFO,
    * MP3 frame header). Pure map-only projection — header sniffing a
    * 100 TB audio column never leaves whole-stage codegen.
    */
  def audioMetadata(media: DataFrame): DataFrame = {
    val meta = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.AudioMeta(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("payload"))))
    media.select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        meta.as("m"))
      .select(col("doc_id"), col("n_bytes"),
        col("m.format").as("format"),
        col("m.channels").cast("long").as("channels"),
        col("m.sample_rate").cast("long").as("sample_rate"),
        col("m.bits").cast("long").as("bits"),
        col("m.duration_ms").as("duration_ms"))
  }

  /** Deterministic audio-header fixtures — hand-assembled minimal WAV /
    * FLAC / MP3 headers with hand-computable stream parameters (the audio
    * analogue of [[fixtureMedia]]); the m6 oracle pins the hand-computed
    * values. Negative doc_ids keep them disjoint from any real corpus.
    */
  def fixtureAudio(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // WAV PCM 44.1 kHz stereo 16-bit: RIFF/WAVE + fmt(16) + data header;
      // data size 88200 over byte rate 176400 → 500 ms
      (-13L, "524946462400000057415645" + "666D742010000000" +
        "01000200" + "44AC0000" + "10B10200" + "04001000" +
        "6461746188580100", "audio/wav"),
      // FLAC STREAMINFO (truncated before the MD5 — still parseable):
      // 48 kHz stereo 16-bit, 480000 samples → 10000 ms
      (-12L, "664C614300000022" + "10001000" + "000000000000" +
        "0BB802F0" + "00075300", "audio/flac"),
      // MP3 MPEG1 Layer III frame header: 44.1 kHz, stereo mode;
      // bits/duration NULL by design (compressed, VBR)
      (-11L, "FFFB9000", "audio/mpeg")
    ).toDF("doc_id", "hex", "media_type")
      .select(col("doc_id"), unhex(col("hex")).as("payload"),
        col("media_type"))
  }

  /** Batch feature extraction via mapPartitions (the mapInPandas analogue).
    * Partition-parallel, no shuffle; output is a typed Dataset.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "payload", "media_type").as[MediaRecord]
      .mapPartitions(it => decoder.decodePartition(it))
  }

  /** Frame sampling stub: byte-range slices of the payload standing in for
    * video frame extraction (`substring` works on binary). Emits
    * (doc_id, frame_idx, frame_bytes) — the explode shape a real frame
    * sampler produces.
    */
  def sampleFrames(media: DataFrame, frameSize: Int, nFrames: Int): DataFrame =
    // The payload rides through the explode projection — no join back to the
    // source (a generator keeps sibling columns, so re-acquiring the payload
    // via self-join would add a pure-overhead shuffle at scale).
    media.select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameSize + 1,
          lit(frameSize)).as("frame_bytes"))
      .filter(length(col("frame_bytes")) > 0)

  /** Perceptual fingerprint per payload: the 56-bit dHash
    * ([[graft.functions.DHash56]] — grid-average + neighbor-compare over
    * the payload's code points, the stub-pixel contract). Pure codegen
    * projection; the hash column feeds the SAME pigeonhole Hamming
    * similarity join SimHash text dedup uses
    * ([[graft.plans.HammingJoinRewrite]]), which is the point: media
    * near-dup at 100 TB is a solved join once payloads collapse to
    * Hamming-comparable fingerprints.
    */
  def perceptualHash(media: DataFrame): DataFrame = {
    val ph = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.DHash56(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          col("payload").cast("string"))))
    media.select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      ph.as("phash"))
  }

  /** Resize/thumbnail stub: the payload is cut into `nTiles` equal tiles
    * (tail remainder dropped, as a real downsampler drops edge pixels)
    * and each tile reduced to its digest — standing in for per-tile pixel
    * averaging. The Spark-side plumbing is the real contract: binary
    * slicing + digest per tile in ONE codegen projection, zero shuffle,
    * no per-row driver work; swap the digest for a pixel kernel (via
    * [[extractFeatures]]'s batch decoder) and the plan is unchanged.
    * Payloads shorter than `nTiles` bytes yield null tiles (undecodable
    * thumbnail), kept — a real pipeline quarantines rather than drops.
    */
  def thumbnails(media: DataFrame, nTiles: Int): DataFrame = {
    val q = (length(col("payload")) / nTiles).cast("int")
    val tiles = (0 until nTiles).map { i =>
      when(q > 0, md5(col("payload").substr(q * i + 1, q)))
        .as(s"tile_$i")
    }
    media.select(col("doc_id") +: length(col("payload")).cast("long")
      .as("n_bytes") +: tiles: _*)
  }
}
