package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level multimodal container handling as native expressions: the
  * header-parse path is a pure `binary → struct` function, so it lives
  * inside WholeStageCodegen as a single static call per row — no RDD
  * round-trip, no Row re-encoding, columnar parquet input preserved.
  * (Payload *decoding* past the header needs codec libraries and
  * per-partition batch state — that slot stays on
  * `graft.operators.Multimodal.decodeBatch`.)
  */
object MmFormat {

  /** Typed metadata per blob; format-inapplicable fields are None. */
  final case class Meta(mime: String, width: Option[Int], height: Option[Int],
                        sampleRate: Option[Int], channels: Option[Int])

  /** Byte-level container-header parser (public formats, no deps):
    * PNG signature + IHDR (RFC 2083 §3.1) and RIFF/WAVE `fmt ` chunks.
    */
  object HeaderParser {
    private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

    private def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    private def be16(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

    /** JPEG marker walk to the first SOF frame header (ITU T.81 §B.2):
      * markers are 0xFF id; standalone ids (01, D0-D7) carry no payload,
      * every other segment starts with a big-endian u16 length that
      * INCLUDES the length bytes. SOFn (C0-CF minus C4/C8/CC) carries
      * precision u8, height u16be, width u16be. The walk stops at SOS
      * (DA — entropy-coded data follows, no more headers), EOI (D9), or
      * any malformed length (must advance strictly forward).
      */
    private def jpeg(b: Array[Byte]): Meta = {
      var o = 2
      while (o + 4 <= b.length) {
        if ((b(o) & 0xff) != 0xff) return Meta("image/jpeg", None, None, None, None)
        val id = b(o + 1) & 0xff
        if (id == 0xff) { o += 1 } // fill bytes before a marker are legal
        else if (id == 0x01 || (id >= 0xd0 && id <= 0xd7)) { o += 2 }
        else if (id == 0xd9 || id == 0xda) return Meta("image/jpeg", None, None, None, None)
        else {
          val len = be16(b, o + 2)
          if (len < 2) return Meta("image/jpeg", None, None, None, None)
          val isSof = id >= 0xc0 && id <= 0xcf && id != 0xc4 && id != 0xc8 && id != 0xcc
          if (isSof) {
            if (o + 2 + 7 <= b.length && len >= 7)
              return Meta("image/jpeg",
                Some(be16(b, o + 7)), Some(be16(b, o + 5)), None, None)
            return Meta("image/jpeg", None, None, None, None)
          }
          o += 2 + len // strictly advances: len >= 2
        }
      }
      Meta("image/jpeg", None, None, None, None)
    }

    def parse(b: Array[Byte]): Meta = {
      if (b.length >= 24 && b.take(8).sameElements(PngSig) && tag(b, 12) == "IHDR")
        // IHDR: width/height are the first two big-endian u32 of the chunk body
        Meta("image/png", Some(be32(b, 16)), Some(be32(b, 20)), None, None)
      else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
        jpeg(b)
      else if (b.length >= 10 &&
          (new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII) == "GIF87a" ||
           new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII) == "GIF89a"))
        // GIF logical screen descriptor (GIF89a spec §18): width and
        // height are little-endian u16 right after the 6-byte signature
        Meta("image/gif", Some(le16(b, 6)), Some(le16(b, 8)), None, None)
      else if (b.length >= 36 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE") {
        // walk RIFF chunks for "fmt ": u16le channels at +2, u32le rate at +4
        var o = 12
        while (o + 8 <= b.length) {
          val id = tag(b, o)
          val sz = le32(b, o + 4)
          if (id == "fmt " && o + 8 + 8 <= b.length)
            return Meta("audio/wav", None, None,
              Some(le32(b, o + 8 + 4)), Some(le16(b, o + 8 + 2)))
          // a crafted size >= 2^31 reads back negative; the offset must
          // strictly advance or the walk would loop forever on the chunk
          val next = o + 8 + sz + (sz & 1) // chunks are word-aligned
          if (sz < 0 || next <= o) return Meta("audio/wav", None, None, None, None)
          o = next
        }
        Meta("audio/wav", None, None, None, None)
      } else Meta("application/octet-stream", None, None, None, None)
    }
  }

  /** Synthesize genuine container headers (for the corpus, which ships
    * no media): PNG with derived dimensions, WAV with derived
    * sample-rate/channels, or raw bytes — keyed off stable content so
    * results are reproducible.
    */
  object Synth {
    def payload(docId: Long, text: String): Array[Byte] = {
      val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h = java.util.Arrays.hashCode(body)
      (docId % 5) match {
        case 0 => png(16 + math.floorMod(h, 1024), 16 + math.floorMod(h >> 10, 1024), body)
        case 1 => wav(8000 + 100 * math.floorMod(h, 441), 1 + math.floorMod(h >> 16, 2), body)
        case 2 => jpeg(8 + math.floorMod(h, 4096), 8 + math.floorMod(h >> 12, 4096), body)
        case 3 => gif(8 + math.floorMod(h, 4096), 8 + math.floorMod(h >> 12, 4096), body)
        case _ => body
      }
    }

    /** Minimal genuine GIF89a: signature + logical screen descriptor
      * (u16le width/height, no global color table), body as opaque
      * trailing bytes.
      */
    def gif(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(13 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.putShort((width & 0xffff).toShort).putShort((height & 0xffff).toShort)
      bb.put(0.toByte).put(0.toByte).put(0.toByte) // packed, bg index, aspect
      bb.put(body, 0, math.min(body.length, bb.remaining()))
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }

    def png(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(33 + body.length)
      bb.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
      bb.putInt(13).put("IHDR".getBytes).putInt(width).putInt(height)
      bb.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      bb.putInt(0) // CRC placeholder; parser reads the header fields only
      bb.put(body, 0, math.min(body.length, bb.remaining()))
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }

    /** Minimal genuine JPEG: SOI, JFIF APP0, a baseline SOF0 frame
      * header (one component), then the body as opaque trailing bytes —
      * exactly the marker sequence the parser walks (ITU T.81 §B.2).
      */
    def jpeg(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(2 + 18 + 13 + body.length)
      bb.put(0xff.toByte).put(0xd8.toByte)                     // SOI
      bb.put(0xff.toByte).put(0xe0.toByte).putShort(16.toShort) // APP0 len 16
      bb.put("JFIF".getBytes).put(0.toByte)                    // identifier
      bb.put(1.toByte).put(1.toByte)                           // version 1.1
      bb.put(0.toByte).putShort(1.toShort).putShort(1.toShort) // units, density
      bb.put(0.toByte).put(0.toByte)                           // no thumbnail
      bb.put(0xff.toByte).put(0xc0.toByte).putShort(11.toShort) // SOF0 len 11
      bb.put(8.toByte)                                         // precision
      bb.putShort((height & 0xffff).toShort)
      bb.putShort((width & 0xffff).toShort)
      bb.put(1.toByte)                                         // 1 component
      bb.put(1.toByte).put(0x11.toByte).put(0.toByte)          // comp spec
      bb.put(body, 0, math.min(body.length, bb.remaining()))
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }

    def wav(sampleRate: Int, channels: Int, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val dataLen = body.length
      bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16)
      bb.putShort(1.toShort).putShort(channels.toShort).putInt(sampleRate)
      bb.putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16.toShort)
      bb.put("data".getBytes).putInt(dataLen).put(body)
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
  }

  /** The `graft_mm_meta` struct layout. */
  val MetaStruct: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true)))

  /** The `graft_wav_stats` struct layout: integer-exact PCM facts —
    * n_samples = -1 marks a non-WAV/headerless payload (a sentinel
    * keeps the expression non-nullable and codegen branch-free; the
    * operator filters on it).
    */
  val WavStatsStruct: StructType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("energy", LongType, nullable = false)))

  /** PCM sample statistics from a RIFF/WAVE `data` chunk: sample
    * count, peak |amplitude|, and Σ sample² — all integer-exact (the
    * float steps, duration and RMS, happen relationally downstream so
    * the kernel stays engine-reproducible). 16-bit little-endian PCM
    * per the `fmt ` contract [[Synth.wav]] writes; a trailing odd byte
    * is ignored. Walks chunks with the same strictly-advancing guard
    * as [[HeaderParser.parse]].
    */
  def wavStatsKernel(b: Array[Byte]): InternalRow = {
    def tag(o: Int) = new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def le32(o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    val none = new GenericInternalRow(Array[Any](-1L, 0, 0L))
    if (b.length < 36 || tag(0) != "RIFF" || tag(8) != "WAVE") return none
    var o = 12
    while (o + 8 <= b.length) {
      val id = tag(o)
      val sz = le32(o + 4)
      if (sz < 0) return none
      if (id == "data") {
        val end = math.min(b.length, o + 8 + sz)
        var i = o + 8
        var n = 0L
        var peak = 0
        var energy = 0L
        while (i + 1 < end) {
          val s = ((b(i) & 0xff) | (b(i + 1) << 8)).toShort.toInt
          val a = math.abs(s)
          if (a > peak) peak = a
          energy += s.toLong * s.toLong
          n += 1
          i += 2
        }
        return new GenericInternalRow(Array[Any](n, peak, energy))
      }
      val next = o + 8 + sz + (sz & 1)
      if (next <= o) return none
      o = next
    }
    none
  }

  // ---- static kernels called from generated code ----
  def synthKernel(docId: Long, text: UTF8String): Array[Byte] =
    Synth.payload(docId, text.toString)

  def metaKernel(b: Array[Byte]): InternalRow = {
    val m = HeaderParser.parse(b)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(m.mime),
      m.width.orNull, m.height.orNull, m.sampleRate.orNull, m.channels.orNull))
  }
}

/** `graft_mm_synth(doc_id, text)` — deterministic container-header
  * payload synthesis as a codegen'd `(long, string) → binary` call.
  */
case class MmSynthPayload(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, StringType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_mm_synth expects (long, string), got $t")
    }

  override protected def nullSafeEval(id: Any, text: Any): Any =
    MmFormat.synthKernel(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, t) =>
      s"graft.expressions.MmFormat.synthKernel($id, $t)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MmSynthPayload =
    copy(left = newLeft, right = newRight)
}

/** `graft_wav_stats(payload)` — integer-exact PCM statistics of a
  * RIFF/WAVE data chunk as a codegen'd `binary → struct` call (see
  * [[MmFormat.wavStatsKernel]]); non-WAV payloads yield the
  * `n_samples = -1` sentinel row.
  */
case class WavStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MmFormat.WavStatsStruct

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_wav_stats expects binary, got $t")
  }

  override protected def nullSafeEval(b: Any): Any =
    MmFormat.wavStatsKernel(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.expressions.MmFormat.wavStatsKernel($b)")

  override protected def withNewChildInternal(newChild: Expression): WavStats =
    copy(child = newChild)
}

/** `graft_mm_meta(payload)` — container-header parse as a codegen'd
  * `binary → struct` call (see [[MmFormat.HeaderParser]]).
  */
case class MmHeaderMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MmFormat.MetaStruct

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_mm_meta expects binary, got $t")
  }

  override protected def nullSafeEval(b: Any): Any =
    MmFormat.metaKernel(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.expressions.MmFormat.metaKernel($b)")

  override protected def withNewChildInternal(newChild: Expression): MmHeaderMeta =
    copy(child = newChild)
}
