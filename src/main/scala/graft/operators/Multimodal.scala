package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** A multimodal asset: opaque `binary` content + typed metadata — the
  * schema shape a 100 TB image/audio/video pipeline uses (content stays
  * an uninterpreted byte column, exactly like the reference's
  * `types.Record.Data`, kinesis.go:34; metadata is columnar and
  * prunable).
  */
case class MMAsset(doc_id: Long, modality: String, content: Array[Byte],
  width: Int, height: Int)

/** Decoded-feature row produced by the (stubbed) decoder. */
case class MMFeature(doc_id: Long, modality: String, feat_dim: Int,
  byte_len: Int, checksum: Long)

/** Multimodal-column operators (builder brief): binary content columns
  * with typed metadata, and a decode/feature-extract stage implemented
  * as a batched `mapPartitions` — the Scala analog of `mapInPandas`:
  * one partition = one worker, records micro-batched inside the
  * partition so a real decoder could amortize model/codec setup.
  *
  * The decode itself is a STUB (this container has no image/audio
  * codecs): [[Multimodal.decodeStub]] produces a deterministic fake
  * feature vector from the bytes. Everything around it — schema,
  * partitioning, batch shape, encoders — is real and tested.
  */
object Multimodal {

  /** STUB decoder — stands in for JPEG/PCM/H.264 decoding, which needs
    * codec libraries absent from this environment. Deterministic on
    * content bytes so tests and the driver's check are stable. The
    * checksum is a polynomial fold mod a prime — chosen (like t04's
    * pluggable md5) so a SQL oracle can recompute it byte-for-byte
    * (`list_reduce` over the bytes) and the whole mapPartitions decode
    * path is hash-checked end-to-end, not merely rows-only.
    */
  private val ChecksumMod = 1000000007L

  private def decodeStub(a: MMAsset): MMFeature = {
    var sum = 0L
    var i = 0
    while (i < a.content.length) {
      sum = (sum * 31 + (a.content(i) & 0xff)) % ChecksumMod
      i += 1
    }
    MMFeature(a.doc_id, a.modality, feat_dim = 8, byte_len = a.content.length,
      checksum = sum)
  }

  /** documents → synthetic multimodal assets (binary content + typed
    * metadata), deterministic.
    */
  private def assets(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("modality"),
      col("text").cast("binary").as("content"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"))

  /** Public df-in/df-out binary metadata extraction over any frame with
    * an id and a binary column: byte length + content digest (fully
    * Catalyst, codegen'd — a metadata query never decodes).
    */
  def binaryMeta(df: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content"): DataFrame =
    df.select(col(idCol).as("doc_id"), col(contentCol).as("content"))
      .select(col("doc_id"),
        octet_length(col("content")).as("n_bytes"),
        md5(col("content")).as("content_md5"))

  /** Public df-in/df-out frame sampling: slice the binary column into
    * fixed-size frames and keep every `stride`-th, without decoding.
    * Output: (doc_id, frame_idx, frame_bytes).
    */
  def frameSample(df: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content", frameSize: Int = 256,
      stride: Int = 4): DataFrame =
    df.select(col(idCol).as("doc_id"), col(contentCol).as("content"))
      .withColumn("n_frames",
        ceil(octet_length(col("content")) / frameSize.toDouble).cast("int"))
      .filter(col("n_frames") > 0)
      // explode a PLAIN sequence and apply the stride filter after the
      // generator — explode over a lambda-HOF result re-evaluates the
      // lambda per emitted row (the repo's measured ~30× pitfall)
      .withColumn("frame_idx", explode(expr("sequence(0, n_frames - 1)")))
      .filter(col("frame_idx") % stride === 0)
      .select(col("doc_id"), col("frame_idx"),
        octet_length(expr(
          s"substring(content, frame_idx * $frameSize + 1, $frameSize)")).as("frame_bytes"))

  /** Public df-in/df-out nearest-neighbor resize over a binary column
    * treated as a row-major `srcWidth`-byte-wide grid (the codec-free
    * stand-in for image resize: real pixel decode needs codecs absent
    * here, but the GRID MATH — source-index arithmetic, sampling
    * pattern, output shape — is exactly what a real resize kernel
    * does, and it is what Spark executes). Output: (doc_id, src_h,
    * pix) with `pix` the outW×outH sampled bytes, row-major. Pure
    * per-row expression arithmetic: zero shuffles, codegen'd,
    * partition-parallel at any scale.
    */
  def resizeNearest(df: DataFrame, srcWidth: Int, outW: Int, outH: Int,
      idCol: String = "doc_id", contentCol: String = "content"): DataFrame = {
    require(srcWidth > 0 && outW > 0 && outH > 0, "dims must be positive")
    df.select(col(idCol).as("doc_id"), col(contentCol).as("content"))
      .withColumn("src_h",
        expr(s"CAST(octet_length(content) DIV $srcWidth AS INT)"))
      .filter(col("src_h") > 0)
      // nearest-neighbor: out pixel p = (r, c) samples source byte at
      // row (r*src_h) div outH, column (c*srcWidth) div outW. The byte
      // is read from the BINARY column (substring slices bytes on
      // binary) and decoded via hex → conv, so values ≥ 0x80 come back
      // as the raw byte — never a UTF-8 codepoint or a char offset.
      .withColumn("pix", expr(
        s"""transform(sequence(0, ${outW * outH - 1}), p ->
              CAST(conv(hex(substring(content,
                (((p DIV $outW) * src_h) DIV $outH) * $srcWidth
                  + ((p % $outW) * $srcWidth) DIV $outW + 1, 1)), 16, 10) AS BIGINT))"""))
      .select(col("doc_id"), col("src_h"), col("pix"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary-column metadata extraction — fully Catalyst (codegen'd),
    // oracle-checked: byte length + content digest over the binary col.
    "m01_binary_meta" -> ((s, dir) => {
      assets(s, dir)
        .select(col("doc_id"), col("modality"),
          octet_length(col("content")).as("n_bytes"),
          md5(col("content")).as("content_md5"),
          substring(md5(col("content")), 1, 8).as("md5_pfx"))
        .orderBy("doc_id")
    }),

    // Batched decode / feature-extract via mapPartitions (mapInPandas
    // analog). Decoder is a deterministic stub; plumbing is real, and
    // hash-checked: the DuckDB oracle recomputes the stub's polynomial
    // checksum with list_reduce over the document's bytes.
    "m02_decode_features" -> ((s, dir) => {
      import s.implicits._
      val ds = assets(s, dir).as[MMAsset]
      ds.mapPartitions { it =>
        // Micro-batch inside the partition: a real decoder would load
        // its codec/model once per batch, not once per record.
        it.grouped(64).flatMap(batch => batch.iterator.map(decodeStub))
      }.toDF()
        .orderBy("doc_id")
    }),

    // Frame sampling for "video" assets: every 256-byte block stands in
    // for a frame; sample every 4th. Shows slicing binary payloads into
    // per-frame rows without decoding. Oracle-checked (the text corpus
    // is ASCII, so DuckDB's char offsets equal Spark's byte offsets).
    "m03_frame_sample" -> ((s, dir) =>
      frameSample(assets(s, dir).filter(col("modality") === "video"),
        frameSize = 256, stride = 4)
        .orderBy("doc_id", "frame_idx")),

    // Image resize shape for "image" assets: the payload as a 32-wide
    // byte grid, nearest-neighbor-sampled down to 8×8 — the codec-free
    // resize kernel (real index arithmetic, stubbed pixels). Long-form
    // scalar output for the gate: per-doc pixel sum + corner pixel.
    // Oracle-checked (ASCII corpus: ascii(char) == content byte).
    "m05_image_resize" -> ((s, dir) =>
      resizeNearest(assets(s, dir).filter(col("modality") === "image"),
          srcWidth = 32, outW = 8, outH = 8)
        .select(col("doc_id"), col("src_h"),
          expr("aggregate(pix, 0L, (acc, x) -> acc + x)").as("px_sum"),
          element_at(col("pix"), 1).as("px_first"),
          element_at(col("pix"), 64).as("px_last"))
        .orderBy("doc_id")),

    // Audio resampling shape for "audio" assets: the binary payload is
    // treated as a stream of 2-byte PCM-ish samples, decimated 3:1
    // (keep every 3rd sample) with a summed amplitude proxy (first byte
    // of each kept sample) — all plain substring/HOF arithmetic over the
    // binary column, no codec. Oracle-checked (ASCII corpus: DuckDB char
    // offsets equal byte offsets).
    "m04_audio_resample" -> ((s, dir) => {
      assets(s, dir)
        .filter(col("modality") === "audio")
        .withColumn("n_samples", expr("CAST(octet_length(content) / 2 AS INT)"))
        .filter(col("n_samples") > 0)
        .withColumn("kept", expr("filter(sequence(0, n_samples - 1), i -> i % 3 = 0)"))
        .select(col("doc_id"), col("n_samples"), size(col("kept")).as("n_kept"),
          expr("""aggregate(
                    transform(kept, i ->
                      CAST(ascii(substring(CAST(content AS STRING), i * 2 + 1, 1)) AS BIGINT)),
                    0L, (acc, x) -> acc + x)""").as("amp_sum"))
        .orderBy("doc_id")
    })
  )

  def oracles: Map[String, String] = Map(
    "m01_binary_meta" ->
      """SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         CAST(strlen(text) AS INTEGER) AS n_bytes,
         md5(text) AS content_md5,
         substring(md5(text), 1, 8) AS md5_pfx
         FROM documents ORDER BY doc_id""",

    // The stub checksum is acc ← (acc*31 + byte) mod p folded left to
    // right; list_reduce's implicit initial accumulator (the first
    // element) equals the Scala fold's state after its first step
    // ((0*31 + b0) mod p = b0), so the two folds agree from step one.
    // The corpus is ASCII, so ascii(char) == the content byte.
    "m02_decode_features" ->
      """SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         CAST(8 AS INTEGER) AS feat_dim,
         CAST(strlen(text) AS INTEGER) AS byte_len,
         CAST(CASE WHEN strlen(text) = 0 THEN 0 ELSE
           list_reduce(
             list_transform(generate_series(1, strlen(text)),
               i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)),
             (acc, x) -> (acc * 31 + x) % 1000000007)
         END AS BIGINT) AS checksum
         FROM documents ORDER BY doc_id""",

    "m03_frame_sample" ->
      """WITH v AS (SELECT doc_id, text,
                      CAST(ceil(strlen(text)/256.0) AS INTEGER) AS n_frames
                    FROM documents WHERE doc_id % 3 = 2),
         f AS (SELECT doc_id,
                 CAST(unnest(list_filter(generate_series(0, n_frames-1),
                   i -> i % 4 = 0)) AS INTEGER) AS frame_idx,
                 text
               FROM v WHERE n_frames > 0)
         SELECT doc_id, frame_idx,
           CAST(strlen(substring(text, frame_idx*256+1, 256)) AS INTEGER) AS frame_bytes
         FROM f ORDER BY doc_id, frame_idx""",

    // Same nearest-neighbor index arithmetic with `//` for Spark's DIV;
    // out pixel p samples byte (((p//8)*src_h)//8)*32 + ((p%8)*32)//8.
    "m05_image_resize" ->
      """WITH img AS (SELECT doc_id, text,
                        CAST(strlen(text) // 32 AS INTEGER) AS src_h
                      FROM documents WHERE doc_id % 3 = 0),
         px AS (SELECT doc_id, src_h,
                  list_transform(generate_series(0, 63), p ->
                    CAST(ascii(substring(text,
                      (((p // 8) * src_h) // 8) * 32
                        + ((p % 8) * 32) // 8 + 1, 1)) AS BIGINT)) AS pix
                FROM img WHERE src_h > 0)
         SELECT doc_id, src_h,
           CAST(list_sum(pix) AS BIGINT) AS px_sum,
           pix[1] AS px_first, pix[64] AS px_last
         FROM px ORDER BY doc_id""",

    "m04_audio_resample" ->
      """WITH a AS (SELECT doc_id, text,
                      CAST(strlen(text) // 2 AS INTEGER) AS n_samples
                    FROM documents WHERE doc_id % 3 = 1),
         k AS (SELECT doc_id, n_samples,
                 list_filter(generate_series(0, n_samples - 1), i -> i % 3 = 0) AS kept,
                 text
               FROM a WHERE n_samples > 0)
         SELECT doc_id, n_samples, CAST(len(kept) AS INTEGER) AS n_kept,
           CAST(list_sum(list_transform(kept,
             i -> ascii(substring(text, i*2+1, 1)))) AS BIGINT) AS amp_sum
         FROM k ORDER BY doc_id"""
  )
}
