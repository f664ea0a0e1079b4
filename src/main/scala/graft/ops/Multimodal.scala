package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed by partition-parallel
  * decode functions.
  *
  * Two tiers since round 7:
  *  - a REAL image path ([[pngView]]/[[decodePng]]): deterministic real PNG
  *    payloads encoded and decoded with `javax.imageio` (in the JDK, so no
  *    external library) — width, height and the pixel checksum come from an
  *    actual codec roundtrip and are oracle-graded;
  *  - the original STUB tier (clearly marked below) for the modalities the
  *    container has no codec for (audio/video): it derives "metadata" from
  *    the first bytes of the payload. Everything around it is the real
  *    Spark plumbing — binary column, schema, batch shape,
  *    partition-parallel mapPartitions (the Scala analog of `mapInPandas`:
  *    one iterator per partition, so a real decoder amortizes codec init
  *    per partition, not per row).
  */
object Multimodal {

  final case class PngRow(doc_id: Long, payload: Array[Byte])
  final case class PngMeta(doc_id: Long, is_png: Boolean, width: Int,
                           height: Int, px_sum: Long)

  /** Deterministic REAL-PNG column: a grayscale image per document —
    * width `(doc_id % 13) + 1`, height `(doc_id % 7) + 1`, pixel
    * `(x, y) = (doc_id + 31x + 17y) % 256` — encoded by `javax.imageio`
    * into genuine compressed PNG bytes (signature, IHDR/IDAT/IEND, CRCs,
    * DEFLATE). The formula-derived shape is what lets the DuckDB oracle
    * grade a real codec roundtrip: PNG is lossless, so the decoder must
    * reproduce these exact numbers or the gate hash-mismatches. */
  def pngView(spark: SparkSession, dir: String): Dataset[PngRow] = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (id % 13).toInt + 1
          val h = (id % 7).toInt + 1
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0, ((id + 31L * x + 17L * y) % 256L).toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          PngRow(id, bos.toByteArray)
        }
      }
  }

  private val PngSignature =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** REAL decode via `javax.imageio`: container sniff (PNG signature
    * bytes), then a full codec roundtrip — width/height from the decoded
    * image, px_sum over the decoded raster. Fails loud on an undecodable
    * payload (a corrupt image must not silently become metadata). */
  def decodePng(spark: SparkSession, dir: String): Dataset[PngMeta] = {
    import spark.implicits._
    pngView(spark, dir).mapPartitions { it =>
      // ImageIO scans for plugins lazily; touching it here keeps codec
      // discovery once per partition, not per row
      javax.imageio.ImageIO.getUseCache
      it.map { r =>
        val isPng = r.payload.length >= 8 &&
          r.payload.take(8).sameElements(PngSignature)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"doc ${r.doc_id}: payload is not a decodable image")
        val raster = img.getRaster
        var s = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) { s += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        PngMeta(r.doc_id, isPng, img.getWidth, img.getHeight, s)
      }
    }
  }

  /** The oracle-graded real-decoder query: every reported number has
    * passed through an actual PNG encode + decode. */
  def pngMetaQuery(spark: SparkSession, dir: String): DataFrame =
    decodePng(spark, dir).toDF().orderBy(col("doc_id"))

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, byte_len: Long, width: Int,
                             height: Int, format: String)

  /** STUB DECODER — deterministic fake standing in for an image decode
    * (e.g. JPEG header parse). A real implementation would replace only this
    * function; the partitioning/schema/batch shape around it stay as-is. */
  def fakeDecode(id: Long, payload: Array[Byte]): MediaMeta = {
    val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
    val b1 = if (payload.length > 1) payload(1) & 0xff else 0
    MediaMeta(id, payload.length.toLong, b0 % 64 + 1, b1 % 64 + 1,
      Seq("png", "jpg", "webp")(b0 % 3))
  }

  /** Binary-payload view of `documents` (payload = utf8 bytes — the fixture
    * has no real media; the binary column type and everything downstream is
    * the real contract). */
  def binaryView(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Partition-parallel decode via mapPartitions — iterator-per-partition so
    * per-partition init (codec/model load) happens once. */
  def decodeMeta(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    binaryView(spark, dir).as[MediaRow]
      .mapPartitions { it =>
        // real decoder init would go here, once per partition
        it.map(r => fakeDecode(r.doc_id, r.payload))
      }
  }

  /** The oracle-checkable metadata query (column-expression form of the same
    * stub semantics, so it stays inside whole-stage codegen). */
  def metaQuery(spark: SparkSession, dir: String): DataFrame =
    binaryView(spark, dir).select(
      col("doc_id"),
      octet_length(col("payload")).cast("long").as("byte_len"),
      (expr("ascii(substring(decode(payload, 'UTF-8'), 1, 1))") % 64 + 1).as("width"),
      (expr("ascii(substring(decode(payload, 'UTF-8'), 2, 1))") % 64 + 1).as("height"),
      element_at(array(lit("png"), lit("jpg"), lit("webp")),
        (expr("ascii(substring(decode(payload, 'UTF-8'), 1, 1))") % 3 + 1).cast("int"))
        .as("format"))
      .orderBy(col("doc_id"))

  final case class MediaFeature(doc_id: Long, feature: Array[Float])
  final case class MediaThumb(doc_id: Long, thumb: Array[Byte])

  /** Feature extraction: payload -> fixed-length Float vector, the batch
    * shape an embedding model produces. STUB COMPUTE (byte histogram over
    * `dims` bins, L1-normalized) standing in for a model forward pass; the
    * mapPartitions boundary is where a real model would load once per
    * partition and run batched inference. Output plugs straight into the
    * Similarity operators (Array[Float] embedding column). */
  def featureExtract(spark: SparkSession, dir: String,
                     dims: Int = 16): Dataset[MediaFeature] = {
    import spark.implicits._
    binaryView(spark, dir).as[MediaRow]
      .mapPartitions { it =>
        // real model init would go here, once per partition
        it.map { r =>
          val hist = new Array[Float](dims)
          var i = 0
          while (i < r.payload.length) {
            hist((r.payload(i) & 0xff) % dims) += 1f; i += 1
          }
          val total = math.max(1f, r.payload.length.toFloat)
          var j = 0
          while (j < dims) { hist(j) /= total; j += 1 }
          MediaFeature(r.doc_id, hist)
        }
      }
  }

  /** Resize: payload -> fixed-size thumbnail bytes via stride sampling (the
    * nearest-neighbor shape of an image downsample; STUB for a real scaler).
    * Constant output size regardless of input — the contract a downstream
    * fixed-shape tensor loader needs. */
  def resize(spark: SparkSession, dir: String, outBytes: Int = 32): Dataset[MediaThumb] = {
    import spark.implicits._
    binaryView(spark, dir).as[MediaRow]
      .mapPartitions(_.map { r =>
        val out = new Array[Byte](outBytes)
        if (r.payload.nonEmpty) {
          val stride = math.max(1.0, r.payload.length.toDouble / outBytes)
          var i = 0
          while (i < outBytes) {
            out(i) = r.payload(math.min(r.payload.length - 1, (i * stride).toInt))
            i += 1
          }
        }
        MediaThumb(r.doc_id, out)
      })
  }

  /** "Frame sampling" on an opaque payload: every nth fixed-size chunk —
    * the batch shape a video pipeline needs (doc_id, frame_no, frame_bytes). */
  def frameSample(spark: SparkSession, dir: String, frameSize: Int = 64,
                  every: Int = 4): DataFrame =
    binaryView(spark, dir)
      .withColumn("frame_no", explode(expr(
        s"filter(sequence(0, int(floor((octet_length(payload) - 1) / $frameSize))), " +
          s"i -> i % $every = 0)")))
      .select(col("doc_id"), col("frame_no"),
        expr(s"substring(payload, frame_no * $frameSize + 1, $frameSize)").as("frame"))

  /** Cross-modal alignment join: text rows to their embedding rows by id —
    * the everyday join of a multimodal training pipeline (captions to image
    * embeddings, documents to their vectors). Both sides are keyed on the
    * id, so this is one co-partitioned shuffle join at any scale; with both
    * tables bucketed by id on disk it is shuffle-free. */
  def textEmbedJoin(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        round(expr("graft_norm(transform(embedding, x -> cast(x as double)))"), 4)
          .as("norm"))
    d.join(e, d("doc_id") === e("vec_id"))
      .select(col("doc_id"), col("lang"), col("n_tok"), col("norm"), col("label"))
      .orderBy(col("doc_id"))
  }
}
