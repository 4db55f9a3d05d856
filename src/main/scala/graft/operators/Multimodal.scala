package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extract are per-batch
  * transforms over the binary bytes.
  *
  * The actual codecs (image/audio libs) are NOT in this container, so the
  * decode step is a clearly-marked deterministic STUB — what is real and
  * tested is the Spark-side contract: binary column schema, metadata
  * struct shape, partition-preserving transform, and bounded per-row work.
  * On a real cluster the stub body is replaced by the codec call; nothing
  * else changes.
  */
object Multimodal {

  /** Attach a binary payload column (here: utf-8 bytes of `text` — the
    * stand-in for image/audio bytes arriving from the feed).
    */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "utf-8"))

  /** STUB decode: derives deterministic pseudo-metadata from the bytes.
    * Real implementation would mapPartitions over an image codec; the
    * schema and arithmetic below are the tested contract.
    * width/height/channels are fake but pure functions of the payload.
    */
  def decodeImageStub(docs: DataFrame): DataFrame =
    withBinaryPayload(docs)
      .withColumn("n_bytes", octet_length(col("payload")))
      .withColumn("meta", struct(
        (col("n_bytes") % 640).cast("int").as("width"),
        ((col("n_bytes") * 7) % 480).cast("int").as("height"),
        lit(3).as("channels")))
      .withColumn("feature", array(
        graft.functions.TextOps.round4(col("n_bytes").cast("double") / 100.0),
        graft.functions.TextOps.round4((col("n_bytes") % 97).cast("double") / 97.0),
        graft.functions.TextOps.round4((col("n_bytes") % 31).cast("double") / 31.0)))

  /** Resize stub: keep every `factor`-th byte of the payload (the real
    * implementation swaps in an image scaler; the tested contract is the
    * binary-in/binary-out column shape plus deterministic output metadata).
    * Output: resized binary + (n_bytes_resized, first_sample) metadata.
    */
  def resizeStub(docs: DataFrame, factor: Int): DataFrame = {
    val nb = octet_length(col("payload"))
    withBinaryPayload(docs)
      .withColumn("resized",
        // every factor-th byte via substring positions 1, 1+f, 1+2f, ...
        encode(concat_ws("", transform(
          sequence(lit(0), floor((nb - 1) / factor).cast("int")),
          i => decode(col("payload"), "utf-8").substr(i * factor + 1, lit(1)))), "utf-8"))
      .withColumn("n_bytes_resized", octet_length(col("resized")).cast("int"))
      .withColumn("first_sample", ascii(decode(col("resized"), "utf-8").substr(1, 1)))
  }

  /** Frame-sample stub: pick `k` deterministic byte offsets per payload
    * (the video-frame-sampling access pattern: k bounded random-access
    * reads per row, no full materialisation).
    */
  def frameSampleStub(docs: DataFrame, k: Int): DataFrame = {
    val withFrames = withBinaryPayload(docs)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), lit(k - 1))).as("frame"))
    // offset_j = (j * n_bytes / k) + 1 (1-based); sample = byte at offset
    val off = floor(col("frame") * octet_length(col("payload")) / k).cast("int") + 1
    withFrames.select(col("doc_id"), col("frame"), off.as("boff"),
      ascii(decode(col("payload"), "utf-8").substr(off, lit(1))).as("sample"))
  }
}
