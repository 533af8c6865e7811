package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata; decode / feature-extract run per-partition
  * over batches so a real decoder amortizes model/codec init once per
  * partition (the Spark-side shape of a pandas_udf/mapInPandas pipeline).
  *
  * All three modalities decode with REAL JDK codecs, oracle-gated
  * end-to-end: `PngDecoder`/`decodeImageStats` via javax.imageio
  * (`multimodal_decode_real`), `WavDecoder`/`decodeAudioStats` via
  * javax.sound.sampled (`multimodal_audio_real`), and `GifDecoder` parsing
  * multi-frame animated GIFs (`multimodal_video_real`) — no external
  * libraries needed, headless-safe. `StubDecoder` remains only as the
  * documented fallback shape for codecs a deployment plugs in natively
  * (H.264 etc.) behind the same `MediaDecoder` seam. The schema contract,
  * partitioning, batch iteration, and null handling are real and tested.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("payload", BinaryType),
    StructField("meta_json", StringType)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("ok", BooleanType)))

  /** The decoder seam: a codec-bearing environment plugs a real
    * implementation in WITHOUT touching the gated queries or the
    * mapPartitions plumbing. The lifecycle contract mirrors a native codec:
    * `open()` once per partition before any row (load the codec/model
    * there, never per row), `decode()` per row, `close()` after the
    * partition's iterator drains. Must be Serializable — the instance is
    * shipped to executors.
    */
  trait MediaDecoder extends Serializable {
    /** once-per-partition codec/model initialization */
    def open(): Unit = ()
    /** (width, height, n_frames, ok) for one payload */
    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Int, Boolean)
    /** once-per-partition teardown (free native codec state) */
    def close(): Unit = ()
  }

  /** STUB decoder — the container default (no image/audio libraries here):
    * derives fake dimensions deterministically from payload bytes. A real
    * implementation dispatches on `media_type` to an actual codec.
    */
  object StubDecoder extends MediaDecoder {
    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Int, Boolean) = {
      if (payload == null || payload.isEmpty) (0, 0, 0, false)
      else {
        val b0 = java.lang.Byte.toUnsignedInt(payload(0))
        val b1 = if (payload.length > 1) java.lang.Byte.toUnsignedInt(payload(1)) else 0
        mediaType match {
          case "image" => (64 + b0 % 64, 64 + b1 % 64, 1, true)
          case "video" => (64 + b0 % 64, 64 + b1 % 64, 1 + payload.length % 300, true)
          case "audio" => (0, 0, 1 + payload.length % 48000, true)
          case _       => (0, 0, 0, false)
        }
      }
    }
  }

  /** Decode a media DataFrame (mediaSchema) to typed features. Runs as
    * mapPartitions: batch shape = one partition, decoder open/close
    * amortized once per partition around the row loop.
    */
  def decode(media: DataFrame, decoder: MediaDecoder = StubDecoder): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    media.select(col("media_id"), col("media_type"), col("payload"))
      .mapPartitions { rows =>
        decoder.open()
        val out = rows.map { r =>
          val id = r.getLong(0)
          val mt = if (r.isNullAt(1)) null else r.getString(1)
          val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          val (w, h, f, ok) = decoder.decode(mt, payload)
          val n = if (payload == null) 0 else payload.length
          Row(id, mt, n, w, h, f, ok)
        }
        new Iterator[Row] {    // close the codec when the partition drains
          private var closed = false
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h && !closed) { closed = true; decoder.close() }
            h
          }
          def next(): Row = out.next()
        }
      }(enc)
  }

  /** REAL image codec via the JDK's own javax.imageio (no external
    * libraries needed, works headless): a valid PNG/BMP/JPEG payload
    * decodes to its true dimensions; anything unreadable is not-ok. This is
    * the production MediaDecoder the container CAN run — native codecs for
    * audio/video plug into the same seam.
    */
  object PngDecoder extends MediaDecoder {
    override def open(): Unit = System.setProperty("java.awt.headless", "true")
    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Int, Boolean) = {
      if (payload == null || payload.isEmpty) (0, 0, 0, false)
      else try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) (0, 0, 0, false)
        else (img.getWidth, img.getHeight, 1, true)
      } catch { case _: Exception => (0, 0, 0, false) }
    }
  }

  /** Deterministic grayscale PNG payload: pixel(x, y) has all channels =
    * (id·31 + x·7 + y·13) mod 256. Real ImageIO ENCODE — the bytes are a
    * valid PNG stream — so a decode round-trip exercises a genuine codec,
    * and the pixel formula lets a SQL oracle recompute the decoded stats
    * exactly.
    */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        val g = ((id * 31 + x * 7 + y * 13) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        y += 1
      }
      x += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val imageStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("ok", BooleanType),
    StructField("mean_px", DoubleType)))

  /** Decode image payloads with the REAL codec and extract pixel features
    * (red-channel mean): mapPartitions, ImageIO warmed once per partition.
    * Exact integer pixel sums → one double division at the boundary.
    */
  def decodeImageStats(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(imageStatsSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        System.setProperty("java.awt.headless", "true")
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val img =
            if (payload == null || payload.isEmpty) null
            else
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
              catch { case _: Exception => null }
          if (img == null) Row(id, 0, 0, false, null)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0L
            var x = 0
            while (x < w) {
              var y = 0
              while (y < h) { sum += (img.getRGB(x, y) >> 16) & 0xff; y += 1 }
              x += 1
            }
            Row(id, w, h, true, sum.toDouble / (w.toLong * h))
          }
        }
      }(enc)
  }

  /** REAL audio codec via the JDK's javax.sound.sampled (WAV/AIFF/AU —
    * again no external libraries): a valid payload decodes to its true
    * frame count; anything unreadable is not-ok.
    */
  object WavDecoder extends MediaDecoder {
    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Int, Boolean) = {
      if (payload == null || payload.isEmpty) (0, 0, 0, false)
      else try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        // a header without a frame count reports NOT_SPECIFIED (-1): that is
        // a not-ok classification, never ok-with-garbage-frames
        try {
          val n = ais.getFrameLength
          if (n > 0 && n <= Int.MaxValue) (0, 0, n.toInt, true) else (0, 0, 0, false)
        } finally ais.close()
      } catch { case _: Exception => (0, 0, 0, false) }
    }
  }

  /** Deterministic PCM16-mono WAV payload: sample(t) =
    * (id·131 + t·17) mod 65536 − 32768. Real AudioSystem ENCODE (a valid
    * RIFF/WAVE stream), so a decode round-trip exercises a genuine codec
    * and a SQL oracle recomputes the decoded sample statistics exactly.
    */
  def syntheticWav(id: Long, n: Int, rate: Int = 8000): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val s = ((id * 131 + t * 17) % 65536 - 32768).toInt
      pcm(2 * t) = (s & 0xff).toByte
      pcm(2 * t + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private val audioStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_frames", IntegerType),
    StructField("ok", BooleanType),
    StructField("mean_amp", DoubleType)))

  /** Decode audio payloads with the REAL codec and extract sample features
    * (mean signed amplitude): exact integer sums over the decoded PCM16
    * little-endian frames, one double division at the boundary.
    */
  def decodeAudioStats(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioStatsSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val decoded: Option[(Int, Long)] =
            if (payload == null || payload.isEmpty) None
            else
              try {
                val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                  new java.io.ByteArrayInputStream(payload))
                try {
                  // same guard as WavDecoder: NOT_SPECIFIED (-1) and
                  // streams past Int.MaxValue frames must fail the decode,
                  // not wrap to a small positive n with a wrong mean
                  val len = ais.getFrameLength
                  if (len <= 0L || len > Int.MaxValue.toLong) None
                  else {
                    val n = len.toInt
                    val data = ais.readAllBytes()
                    var sum = 0L
                    var i = 0
                    while (i + 1 < data.length) {
                      sum += ((data(i + 1) << 8) | (data(i) & 0xff)).toShort.toLong
                      i += 2
                    }
                    Some((n, sum))
                  }
                } finally ais.close()
              } catch { case _: Exception => None }
          decoded match {
            case Some((n, sum)) if n > 0 => Row(id, n, true, sum.toDouble / n)
            case _                       => Row(id, 0, false, null)
          }
        }
      }(enc)
  }

  /** Deterministic multi-frame animated GIF: frame f has gray pixel(x, y) =
    * (id·31 + f·97 + x·7 + y·13) mod 256, quantized to GIF's palette by the
    * encoder — so the decode gate checks frame COUNT and dimensions (exact
    * through any palette), not pixel values. Real ImageIO sequence write.
    */
  def syntheticGif(id: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var x = 0
        while (x < w) {
          var y = 0
          while (y < h) {
            val g = ((id * 31 + f * 97 + x * 7 + y * 13) % 256).toInt
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            y += 1
          }
          x += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** REAL multi-frame (video-shaped) decode via ImageIO's GIF reader: frame
    * count from `getNumImages(true)` — an actual parse of every frame block
    * in the stream — plus the first frame's dimensions.
    */
  object GifDecoder extends MediaDecoder {
    override def open(): Unit = System.setProperty("java.awt.headless", "true")
    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Int, Boolean) = {
      if (payload == null || payload.isEmpty) (0, 0, 0, false)
      else try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        // the finally covers everything after stream creation: a throw from
        // getImageReaders or setInput must still close the stream (memory-
        // backed here, but a file-backed cache stream would leak a
        // descriptor if only the outer catch reclaimed it)
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) (0, 0, 0, false)
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              val n = reader.getNumImages(true)
              if (n < 1) (0, 0, 0, false)
              else (reader.getWidth(0), reader.getHeight(0), n, true)
            } finally reader.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => (0, 0, 0, false) }
    }
  }

  /** Build a media table from documents: payload = utf8 bytes of text,
    * media_type round-robins image/audio/video — deterministic fixture
    * plumbing for tests and benchmarks.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast(IntegerType)).as("media_type"),
      col("text").cast(BinaryType).as("payload"),
      to_json(struct(col("lang"), col("source"), col("n_chars"))).as("meta_json"))
}
