package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2.2 multimodal-column operators.
  *
  * Media payloads are opaque BINARY columns with typed metadata structs.
  * The decode step is STUBBED deterministically (no image/audio libraries
  * in this container): `stubDecodeHeader` stands in for e.g. a JPEG header
  * parse. Everything around the stub — binary column handling, typed
  * Dataset batch iteration via mapPartitions (the Scala analog of a
  * mapInPandas batch UDF: one iterator per partition, amortizing decoder
  * init across rows), schema, partitioning — is real and spec-tested.
  *
  * No DuckDB oracle (binary processing isn't portably SQL-expressible);
  * the driver records rows-only checks and MultimodalSpec covers values.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Int, magic: String,
      width: Int, height: Int, format: String)
  case class Frame(doc_id: Long, frame_idx: Int, offset: Int, frame_md5: String)

  /** Deterministic fake of a media-header decode: derives dimensions from
    * payload bytes the way a real decoder would read them from the header.
    * Replace with a real codec binding in production.
    */
  private def stubDecodeHeader(payload: Array[Byte]): (Int, Int, String) = {
    val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
    val b1 = if (payload.length > 1) payload(1) & 0xff else 0
    val width = 16 * (1 + (b0 % 40))           // 16..640
    val height = 16 * (1 + (b1 % 30))          // 16..480
    val format = (b0 % 3) match {
      case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
    }
    (width, height, format)
  }

  private def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map("%02x".format(_)).mkString
  }

  /** Binary metadata extraction: text bytes stand in for media payloads;
    * one mapPartitions pass "decodes" headers in batch.
    */
  val metaExtract: Op = Op.noOracle("mm_meta_extract") { (spark, dir) =>
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
    media.mapPartitions { rows =>
      // simulate per-partition decoder initialization (expensive in real codecs)
      rows.map { r =>
        val (w, h, fmt) = stubDecodeHeader(r.payload)
        val magic = r.payload.take(4).map("%02x".format(_)).mkString
        MediaMeta(r.doc_id, r.payload.length, magic, w, h, fmt)
      }
    }.toDF()
  }

  /** Frame/window sampling over binary payloads: fixed-stride slices, each
    * "frame" fingerprinted. Batch iterator shape matches a real
    * frame-extraction pass (decoder state reused across frames of a doc).
    */
  val frameSample: Op = Op.noOracle("mm_frame_sample") { (spark, dir) =>
    import spark.implicits._
    val stride = 64
    val media = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val n = math.max(1, (r.payload.length + stride - 1) / stride)
        (0 until n).iterator.map { i =>
          val off = i * stride
          val slice = r.payload.slice(off, math.min(off + stride, r.payload.length))
          Frame(r.doc_id, i, off, md5Hex(slice))
        }
      }
    }.toDF()
  }

  val ops: Seq[Op] = Seq(metaExtract, frameSample)
}
