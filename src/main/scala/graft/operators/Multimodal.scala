package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The pattern for image/audio/video at 100 TB: payloads travel as
  * parquet `binary` columns next to typed metadata; decode/feature
  * steps run batch-wise per partition (here `mapPartitions`; with
  * Python codecs it would be `mapInPandas` with the same batch shape).
  * The decode itself is STUBBED deterministically — the media codecs
  * aren't in this container — but schema, partitioning, batch iteration
  * and the UDF signature are the real, tested plumbing.
  */
object Multimodal {

  /** Wrap a text column as an opaque binary payload with derived
    * metadata — the ingest-side shape of a multimodal table. Pure
    * column ops (oracle-verifiable). */
  def attachPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val blob = col(textCol).cast("binary")
    val h = sha2(blob, 256)
    docs.select(
      col(idCol).as("doc_id"),
      blob.as("payload"),
      h.as("payload_sha"),
      length(blob).as("n_bytes"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("modality"),
      // fake decoded dimensions, deterministic from the content hash
      (lit(64) + conv(substring(h, 1, 4), 16, 10).cast("long") % 1856).as("width"),
      (lit(64) + conv(substring(h, 5, 4), 16, 10).cast("long") % 1016).as("height"))
  }

  /** Decoded-feature record. For a real decoded image, `width`/`height`
    * are the actual pixel dimensions and `meanByte` the mean gray level;
    * for a real decoded WAV, `frames` is the PCM frame count, `meanByte`
    * the mean absolute amplitude in 8-bit units, and
    * `sampleRate`/`channels` the stream parameters; for stub-decoded
    * payloads width/height/sampleRate/channels are 0 and meanByte is the
    * mean raw byte value. */
  case class DecodedFeature(doc_id: Long, modality: String, n_bytes: Int,
                            frames: Int, meanByte: Double,
                            width: Int = 0, height: Int = 0,
                            sampleRate: Int = 0, channels: Int = 0)

  /** Batch decode over partitions — the real distributed plumbing. PNG
    * payloads decode for real via `javax.imageio`, WAV payloads via
    * `javax.sound.sampled`, AVI containers via a RIFF chunk-tree parse,
    * MP3 and FLAC via their own header walks (frame count, sample
    * rate, channels — all pure JVM, no external deps); other formats
    * keep a deterministic fake decoder (their PIXEL/PCM codecs aren't
    * in this environment). Swap `decodeOne`'s fallback for real codecs
    * with the same signature. */
  def decodeFeatures(payloads: DataFrame): Dataset[DecodedFeature] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select("doc_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, modality, bytes) => decodeOne(id, modality, bytes) }
      }
  }

  private val PngMagic = Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)

  /** Mean gray level ((r+g+b)/3 averaged over pixels) of an
    * already-decoded image — shared by the PNG and MJPEG-frame paths. */
  private def meanGrayOf(img: java.awt.image.BufferedImage): Double = {
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
        x += 1
      }
      y += 1
    }
    if (w * h == 0) 0.0 else sum / (w * h)
  }

  /** Real PNG decode: actual dimensions + mean gray level. Returns None
    * on a corrupt payload — including one that passes the magic sniff
    * but fails mid stream (ImageIO throws there rather than returning
    * null) — so the caller falls back to the stub path instead of
    * failing the task. */
  private def decodePng(bytes: Array[Byte]): Option[(Int, Int, Double)] =
    scala.util.Try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else Some((img.getWidth, img.getHeight, meanGrayOf(img)))
    }.toOption.flatten

  private val RiffMagic = "RIFF".getBytes("US-ASCII")
  private val WaveMagic = "WAVE".getBytes("US-ASCII")

  private def isWav(bytes: Array[Byte]): Boolean =
    bytes.length > 12 && bytes.take(4).sameElements(RiffMagic) &&
      bytes.slice(8, 12).sameElements(WaveMagic)

  /** Real WAV decode via `javax.sound.sampled`: (frames, meanAmplitude,
    * sampleRate, channels) for 8-bit unsigned / 16-bit signed PCM — the
    * formats the JDK writes natively. `meanAmplitude` is the mean
    * absolute sample deviation from silence, normalized to 8-bit units
    * (|v−128| for u8; |v|/256 for s16) so both widths land on the same
    * scale. Returns None on corrupt/unsupported payloads — stub
    * fallback, same contract as [[decodePng]]. */
  private def decodeWav(bytes: Array[Byte]): Option[(Int, Double, Int, Int)] =
    scala.util.Try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        import javax.sound.sampled.AudioFormat.Encoding.{PCM_SIGNED, PCM_UNSIGNED}
        if (!((bits == 8 && enc == PCM_UNSIGNED) || (bits == 16 && enc == PCM_SIGNED)))
          None
        else {
          val data = in.readAllBytes()
          var sum = 0.0
          var n = 0
          if (bits == 8) {
            var i = 0
            while (i < data.length) {
              sum += math.abs((data(i) & 0xff) - 128); n += 1; i += 1
            }
          } else {
            val le = !fmt.isBigEndian
            var i = 0
            while (i + 1 < data.length) {
              val lo = data(if (le) i else i + 1) & 0xff
              val hi = data(if (le) i + 1 else i).toInt // sign-extending
              sum += math.abs((hi << 8) | lo) / 256.0
              n += 1; i += 2
            }
          }
          Some((if (n == 0) 0 else n / math.max(1, fmt.getChannels),
            if (n == 0) 0.0 else sum / n,
            fmt.getSampleRate.toInt, fmt.getChannels))
        }
      } finally in.close()
    }.toOption.flatten

  private val AviMagic = "AVI ".getBytes("US-ASCII")

  private def isAvi(bytes: Array[Byte]): Boolean =
    bytes.length > 24 && bytes.take(4).sameElements(RiffMagic) &&
      bytes.slice(8, 12).sameElements(AviMagic)

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** THE RIFF chunk-tree walker, shared by the header and MJPEG paths
    * so the container-parsing rules (word alignment, LIST recursion,
    * declared-extent + buffer clamping) live in exactly one place.
    * Chunks are [fourcc][u32le size][data], word-aligned; LIST chunks
    * nest: [LIST][size][listType][children]. `visit(fourcc, dataStart,
    * dataEnd)` fires for every non-LIST chunk in document order with
    * dataEnd clamped to BOTH the declared parent extent and the buffer;
    * returning false stops the walk. Nesting deeper than `maxDepth`
    * stops silently — a hostile chunk tree must exhaust neither stack
    * nor time. */
  private def walkRiff(bytes: Array[Byte], maxDepth: Int = 32)
                      (visit: (String, Int, Int) => Boolean): Unit = {
    def walk(pos: Int, end: Int, depth: Int): Boolean = {
      if (depth > maxDepth) return true
      var p = pos
      while (p + 8 <= end && p + 8 <= bytes.length) {
        val cc = new String(bytes, p, 4, "US-ASCII")
        val sz = u32le(bytes, p + 4)
        if (sz < 0 || sz > Int.MaxValue - 16) return false
        val dataEnd = math.min(math.min(end.toLong, bytes.length.toLong),
          p + 8 + sz).toInt
        if (cc == "LIST") {
          if (p + 12 <= end && !walk(p + 12, dataEnd, depth + 1)) return false
        } else if (!visit(cc, p + 8, dataEnd)) return false
        p += (8 + sz + (sz & 1)).toInt
      }
      true
    }
    val riffEnd = math.min(bytes.length.toLong, u32le(bytes, 4) + 8).toInt
    walk(12, riffEnd, 0)
  }

  /** Real AVI CONTAINER parse (no codec): walk the RIFF chunk tree to
    * the `avih` main header and return (totalFrames, width, height).
    * Frame count and dimensions come from the actual container
    * structure; pixel decoding happens only when the frames are MJPEG
    * ([[decodeAviMjpeg]]) — other codecs keep metadata-only. Returns
    * None on corrupt/truncated structure (stub fallback, same contract
    * as [[decodePng]]/[[decodeWav]]). */
  private def decodeAviHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    scala.util.Try {
      var res: Option[(Int, Int, Int)] = None
      walkRiff(bytes) { (cc, start, end) =>
        if (cc == "avih") {
          // the avih chunk must DECLARE (and the buffer contain) the 40
          // bytes we read — a truncated avih must fall back to the
          // stub, not return a neighboring chunk's bytes as metadata.
          // avih layout: µs/frame @0, ..., dwTotalFrames @16,
          // dwWidth @32, dwHeight @36
          if (start + 40 <= end)
            res = Some((u32le(bytes, start + 16).toInt,
              u32le(bytes, start + 32).toInt, u32le(bytes, start + 36).toInt))
          false // first avih decides either way
        } else true
      }
      res
    }.toOption.flatten

  private val JpegMagic = Array(0xff, 0xd8).map(_.toByte)

  /** Real MJPEG pixel decode inside an AVI container: walk the `movi`
    * LIST, count the video-data chunks (fourcc `##dc`/`##db`), and
    * ImageIO-decode the FIRST JPEG frame for (nFrames, width, height,
    * meanGray). Motion-JPEG is the one mainstream video codec the bare
    * JVM can decode (every frame is a standalone JPEG), which upgrades
    * the video modality from container-metadata-only to real pixels with
    * zero new dependencies. Returns None when the container has no
    * decodable JPEG frame (e.g. a raw-DIB or foreign-codec AVI) — the
    * caller then falls back to the container-header path. A CORRUPT
    * frame is skipped (per-frame Try), so one truncated JPEG does not
    * forfeit the later decodable frames or the frame count. */
  private def decodeAviMjpeg(bytes: Array[Byte]): Option[(Int, Int, Int, Double)] =
    scala.util.Try {
      var first: Option[java.awt.image.BufferedImage] = None
      var nFrames = 0
      walkRiff(bytes) { (cc, start, end) =>
        if (cc.length == 4 && (cc.endsWith("dc") || cc.endsWith("db"))
            && cc.take(2).forall(_.isDigit)) {
          nFrames += 1
          if (first.isEmpty && end - start > 2 &&
              bytes(start) == JpegMagic(0) && bytes(start + 1) == JpegMagic(1)) {
            first = scala.util.Try(Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(
                java.util.Arrays.copyOfRange(bytes, start, end)))))
              .toOption.flatten
          }
        }
        true
      }
      first.map(img => (nFrames, img.getWidth, img.getHeight, meanGrayOf(img)))
    }.toOption.flatten

  private def u32be(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** ftyp as the first box is how every real muxer writes ISO-BMFF. */
  private def isMp4(bytes: Array[Byte]): Boolean =
    bytes.length > 16 &&
      new String(bytes, 4, 4, "US-ASCII") == "ftyp"

  /** ISO-BMFF containers we descend into; everything else is a leaf. */
  private val Mp4Containers =
    Set("moov", "trak", "mdia", "minf", "stbl", "edts", "mvex", "udta")

  /** THE ISO-BMFF box walker — the MP4 sibling of [[walkRiff]], same
    * hostile-input rules in one place. Boxes are
    * [u32be size][fourcc][payload] with size covering the header;
    * size 1 = 64-bit largesize follows, size 0 = extends to the end of
    * the enclosing box. Extents are clamped to BOTH the enclosing box
    * and the buffer; `visit(fourcc, payloadStart, payloadEnd)` fires
    * for every leaf box in document order, returning false stops the
    * walk; depth is bounded. */
  private def walkMp4(bytes: Array[Byte], maxDepth: Int = 32)
                     (visit: (String, Int, Int) => Boolean): Unit = {
    def walk(pos: Int, end: Int, depth: Int): Boolean = {
      if (depth > maxDepth) return true
      var p = pos
      while (p + 8 <= end && p + 8 <= bytes.length) {
        var sz = u32be(bytes, p)
        val cc = new String(bytes, p + 4, 4, "US-ASCII")
        var hdr = 8
        if (sz == 1) {
          if (p + 16 > end) return false
          val hi = u32be(bytes, p + 8)
          val lo = u32be(bytes, p + 12)
          sz = if (hi != 0) Long.MaxValue else lo
          hdr = 16
        } else if (sz == 0) sz = (end - p).toLong
        if (sz < hdr) return false
        val boxEnd = math.min(math.min(end.toLong, bytes.length.toLong),
          p.toLong + sz).toInt
        if (Mp4Containers(cc)) {
          if (!walk(p + hdr, boxEnd, depth + 1)) return false
        } else if (!visit(cc, p + hdr, boxEnd)) return false
        val next = p.toLong + sz
        if (next <= p) return false // no progress → hostile size
        p = math.min(next, end.toLong).toInt
      }
      true
    }
    walk(0, bytes.length, 0)
  }

  /** Real MP4 (ISO-BMFF) CONTAINER parse, no codec: the first VISUAL
    * track's `tkhd` supplies (width, height) — 16.16 fixed-point, zero
    * for audio tracks — and that same track's `stbl/stts` sample table
    * supplies the frame count (Σ sample_count over its runs: the
    * authoritative sample census, present in every non-fragmented
    * file). A later track's `stts` is never mis-attributed: the
    * capture window opens at a visual `tkhd` and every subsequent
    * `tkhd` closes it, and within a `trak` the sample table always
    * follows the track header. Declared-extent guards on every field
    * read — a truncated box falls back to the stub path, same contract
    * as [[decodeAviHeader]]. */
  private def decodeMp4Header(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    scala.util.Try {
      var w = 0
      var h = 0
      var frames = 0
      var capture = false
      walkMp4(bytes) { (cc, start, end) =>
        cc match {
          case "tkhd" if start + 4 <= end =>
            capture = false // a new track header closes any open window
            val wOff = if (bytes(start) == 1) start + 88 else start + 76
            if (w == 0 && wOff + 8 <= end) {
              val tw = (u32be(bytes, wOff) >> 16).toInt
              val th = (u32be(bytes, wOff + 4) >> 16).toInt
              if (tw > 0 && th > 0) { w = tw; h = th; capture = true }
            }
          case "stts" if capture && frames == 0 && start + 8 <= end =>
            val n = u32be(bytes, start + 4)
            var i = 0
            var sum = 0L
            while (i < n && start + 8 + i * 8 + 8 <= end) {
              sum += u32be(bytes, start + 8 + i * 8)
              i += 1
            }
            if (i == n) frames = math.min(sum, Int.MaxValue.toLong).toInt
            capture = false
          case _ => ()
        }
        true
      }
      if (w > 0 && h > 0 && frames > 0) Some((frames, w, h)) else None
    }.toOption.flatten

  private val FlacMagic = "fLaC".getBytes("US-ASCII")

  private def isFlac(bytes: Array[Byte]): Boolean =
    bytes.length > 4 && bytes.take(4).sameElements(FlacMagic)

  /** FLAC STREAMINFO header walk (no codec): metadata blocks are
    * [1 byte: last-flag | type][3-byte BE length][data]; STREAMINFO
    * (type 0, 34 bytes) packs, from data offset 10, exactly 64 bits of
    * sample_rate(20) | channels−1(3) | bits_per_sample−1(5) |
    * total_samples(36). Returns (frames = total inter-channel samples,
    * sampleRate, channels); None on corrupt/truncated structure —
    * stub fallback, the [[decodeAviHeader]] contract. */
  private def decodeFlacHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    scala.util.Try {
      var res: Option[(Int, Int, Int)] = None
      var p = 4
      var last = false
      while (!last && res.isEmpty && p + 4 <= bytes.length) {
        last = (bytes(p) & 0x80) != 0
        val tpe = bytes(p) & 0x7f
        val len = ((bytes(p + 1) & 0xff) << 16) |
          ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
        val data = p + 4
        if (tpe == 0) {
          // the block must declare AND the buffer contain the 18 bytes
          // we read (same truncation rule as the avih walk)
          if (len >= 34 && data + 18 <= bytes.length) {
            var x = 0L
            var i = 0
            while (i < 8) { x = (x << 8) | (bytes(data + 10 + i) & 0xffL); i += 1 }
            val rate = (x >>> 44).toInt
            val channels = ((x >>> 41) & 0x7).toInt + 1
            val samples = x & 0xfffffffffL // 36 bits
            if (rate > 0)
              res = Some((math.min(samples, Int.MaxValue.toLong).toInt,
                rate, channels))
          }
          last = true // first STREAMINFO decides either way
        }
        p = data + len
      }
      res
    }.toOption.flatten

  /** MPEG-audio (MP3, Layer III) frame-header walk: skip an ID3v2 tag
    * if present, then count frames by hopping frame lengths computed
    * from each header's bitrate/samplerate/padding fields — the
    * container structure, no PCM decode (the AVI/FLAC pattern). At
    * least two consecutive valid frames are required so a random
    * 0xFFE byte pair can't masquerade as audio. Returns (frames,
    * sampleRate, channels); None for free-bitrate streams, non-Layer-
    * III layers, or broken sync. */
  private def isMp3(bytes: Array[Byte]): Boolean =
    bytes.length > 4 && (
      (bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') ||
      ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xe0) == 0xe0))

  private def decodeMp3Header(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    scala.util.Try {
      var p = 0
      // ID3v2: "ID3" + version(2) + flags(1) + syncsafe size(4)
      if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
          bytes(2) == '3') {
        val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
          ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
        p = 10 + sz
      }
      val ratesByVersion = Map( // versionId -> sample-rate table
        3 -> Array(44100, 48000, 32000), // MPEG1
        2 -> Array(22050, 24000, 16000), // MPEG2
        0 -> Array(11025, 12000, 8000))  // MPEG2.5
      val kbpsMpeg1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
        160, 192, 224, 256, 320)
      val kbpsMpeg2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
        96, 112, 128, 144, 160)
      var frames = 0
      var rate = 0
      var channels = 0
      var ok = true
      while (ok && p + 4 <= bytes.length) {
        val h = ((bytes(p) & 0xffL) << 24) | ((bytes(p + 1) & 0xffL) << 16) |
          ((bytes(p + 2) & 0xffL) << 8) | (bytes(p + 3) & 0xffL)
        if (((h >> 21) & 0x7ff) != 0x7ff) ok = false
        else {
          val versionId = ((h >> 19) & 3).toInt
          val layer = ((h >> 17) & 3).toInt // 1 = Layer III
          val brIdx = ((h >> 12) & 0xf).toInt
          val srIdx = ((h >> 10) & 3).toInt
          val padding = ((h >> 9) & 1).toInt
          if (versionId == 1 || layer != 1 || brIdx == 0 || brIdx == 15 ||
              srIdx == 3) ok = false
          else {
            val sr = ratesByVersion(versionId)(srIdx)
            val kbps =
              if (versionId == 3) kbpsMpeg1(brIdx) else kbpsMpeg2(brIdx)
            val frameLen =
              (if (versionId == 3) 144000 else 72000) * kbps / sr + padding
            if (frameLen <= 4) ok = false
            else {
              frames += 1
              rate = sr
              channels = if (((h >> 6) & 3) == 3) 1 else 2
              p += frameLen
            }
          }
        }
      }
      if (frames >= 2) Some((frames, rate, channels)) else None
    }.toOption.flatten

  /** Standalone JPEG decode (`FF D8 FF` magic) — the dominant image
    * format of any web corpus, through the same ImageIO path the MJPEG
    * frames inside AVI already use. None on a corrupt or truncated
    * payload (ImageIO returns null or throws), which falls back to the
    * byte-stub like every other undecodable payload. */
  private def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length > 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff
  private def decodeJpeg(bytes: Array[Byte]): Option[(Int, Int, Double)] =
    scala.util.Try(Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))))
      .toOption.flatten
      .map(img => (img.getWidth, img.getHeight, meanGrayOf(img)))

  /** Decoder dispatch: real `javax.imageio` / `javax.sound.sampled` /
    * RIFF-container decode when the payload IS a PNG / JPEG / WAV / AVI
    * (magic-sniffed), deterministic stub otherwise. */
  private def decodeOne(id: Long, modality: String, bytes: Array[Byte]): DecodedFeature = {
    lazy val meanRaw = if (bytes.isEmpty) 0.0
      else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
    val png = if (bytes.length > 8 && bytes.take(4).sameElements(PngMagic))
      decodePng(bytes) else None
    lazy val jpeg = if (isJpeg(bytes)) decodeJpeg(bytes) else None
    lazy val wav = if (isWav(bytes)) decodeWav(bytes) else None
    lazy val avi = if (isAvi(bytes)) decodeAviHeader(bytes) else None
    lazy val mp4 = if (isMp4(bytes)) decodeMp4Header(bytes) else None
    // header-walk audio containers: stream parameters are real, the
    // PCM itself is not decoded (no codec in the JVM), so meanByte
    // stays the raw-byte mean
    lazy val flac = if (isFlac(bytes)) decodeFlacHeader(bytes) else None
    lazy val mp3 = if (isMp3(bytes)) decodeMp3Header(bytes) else None
    (png orElse jpeg) match {
      case Some((w, h, meanGray)) =>
        DecodedFeature(id, modality, bytes.length, 1, meanGray, w, h)
      case None => (wav orElse
          (flac orElse mp3).map { case (f, r, c) => (f, meanRaw, r, c) }) match {
        case Some((frames, meanAmp, rate, ch)) =>
          DecodedFeature(id, modality, bytes.length, frames, meanAmp,
            sampleRate = rate, channels = ch)
        case None => (avi orElse mp4) match {
          case Some((frames, w, h)) =>
            // MJPEG frames decode for real (pixel meanGray + counted
            // frames); other codecs — and MP4, whose track codecs the
            // bare JVM can't decode — keep the honest container
            // metadata with the raw-byte mean
            (if (isAvi(bytes)) decodeAviMjpeg(bytes) else None) match {
              case Some((nf, fw, fh, meanGray)) =>
                DecodedFeature(id, modality, bytes.length, nf, meanGray, fw, fh)
              case None =>
                DecodedFeature(id, modality, bytes.length, frames, meanRaw, w, h)
            }
          case None =>
            val frames = modality match {
              case "video" => 1 + bytes.length / 64
              case "audio" => 1 + bytes.length / 256
              case _ => 1
            }
            DecodedFeature(id, modality, bytes.length, frames, meanRaw)
        }
      }
    }
  }

  /** 64-bit dHash perceptual hash of a decoded image: area-average the
    * gray channel onto a 9×8 grid, emit one bit per horizontally
    * adjacent cell pair (left-mean < right-mean). The comparison is
    * done in exact integer arithmetic (cross-multiplied box sums, no
    * division), so the hash is bit-deterministic for a given decode.
    * dHash over aHash: gradients survive brightness/contrast shifts
    * that move every absolute gray level. */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    // box sums of (r+g+b) per grid cell + box pixel counts
    val sums = Array.ofDim[Long](8, 9)
    val cnts = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < h) {
      val gy = math.min(7, y * 8 / math.max(1, h))
      var x = 0
      while (x < w) {
        val gx = math.min(8, x * 9 / math.max(1, w))
        val rgb = img.getRGB(x, y)
        sums(gy)(gx) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        cnts(gy)(gx) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        // meanL < meanR ⇔ sumL·cntR < sumR·cntL — exact, no doubles
        if (sums(gy)(gx) * cnts(gy)(gx + 1) < sums(gy)(gx + 1) * cnts(gy)(gx))
          bits |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** (doc_id, phash) for the image payloads ImageIO can decode
    * (PNG/JPEG); undecodable rows are dropped — near-dup detection on
    * garbage bytes is meaningless. mapPartitions like
    * [[decodeFeatures]]: the codec is the one genuinely imperative
    * stage, everything downstream is columnar. */
  def imageHashes(payloads: DataFrame, idCol: String = "doc_id",
                  bytesCol: String = "payload"): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          scala.util.Try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) None else Some((id, dHash64(img)))
          }.toOption.flatten
        }
      }.toDF("doc_id", "phash")
  }

  /** Absolute sample magnitudes of a PCM WAV payload (8-bit unsigned
    * recentred at 128, 16-bit signed either endianness — the
    * [[decodeWav]] encodings), as exact integers. None on
    * non-PCM/corrupt payloads. */
  private def wavAbsSamples(bytes: Array[Byte]): Option[Array[Int]] =
    scala.util.Try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        import javax.sound.sampled.AudioFormat.Encoding.{PCM_SIGNED, PCM_UNSIGNED}
        if (!((bits == 8 && enc == PCM_UNSIGNED) || (bits == 16 && enc == PCM_SIGNED)))
          None
        else {
          val data = in.readAllBytes()
          if (bits == 8) Some(data.map(b => math.abs((b & 0xff) - 128)))
          else {
            val le = !fmt.isBigEndian
            val out = new Array[Int](data.length / 2)
            var i = 0
            while (i + 1 < data.length) {
              val lo = data(if (le) i else i + 1) & 0xff
              val hi = data(if (le) i + 1 else i).toInt // sign-extending
              out(i / 2) = math.abs((hi << 8) | lo)
              i += 2
            }
            Some(out)
          }
        }
      } finally in.close()
    }.toOption.flatten

  /** 64-bit energy-envelope hash of a PCM payload — the audio analog of
    * [[dHash64]]: the |sample| stream is area-averaged onto 65 equal
    * segments and each of the 64 bits records whether the envelope
    * RISES between adjacent segments, compared via cross-multiplied
    * integer segment sums (no division — bit-deterministic). Uniform
    * gain scales every segment sum equally, so the hash is
    * volume-invariant the way dHash is brightness-invariant. Needs
    * ≥ 65 samples for a meaningful envelope; shorter (or non-PCM)
    * payloads return None. */
  def audioEnvelopeHash64(bytes: Array[Byte]): Option[Long] =
    wavAbsSamples(bytes).filter(_.length >= 65).map { s =>
      val n = s.length
      val sums = new Array[Long](65)
      val cnts = new Array[Long](65)
      var i = 0
      while (i < n) {
        val seg = math.min(64, (i.toLong * 65 / n).toInt)
        sums(seg) += s(i)
        cnts(seg) += 1
        i += 1
      }
      var bits = 0L
      var j = 0
      while (j < 64) {
        // meanL < meanR ⇔ sumL·cntR < sumR·cntL — exact, no doubles
        if (sums(j) * cnts(j + 1) < sums(j + 1) * cnts(j))
          bits |= 1L << j
        j += 1
      }
      bits
    }

  /** (doc_id, phash) for the audio payloads the PCM decoder accepts —
    * the audio side of [[imageHashes]], feeding the same
    * [[hammingNearDupPairs]] block join. */
  def audioHashes(payloads: DataFrame, idCol: String = "doc_id",
                  bytesCol: String = "payload"): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          audioEnvelopeHash64(bytes).map(h => (id, h))
        }
      }.toDF("doc_id", "phash")
  }

  /** Audio near-duplicate pairs: envelope hashes through the pigeonhole
    * block join — same contract as [[imageNearDupPairs]]. */
  def audioNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame =
    hammingNearDupPairs(hashes, maxHamming)

  /** Image near-duplicate pairs with hamming(phash) ≤ maxHamming (≤ 3):
    * the [[Dedup.simhashPairs]] pigeonhole on 4 × 16-bit blocks — every
    * qualifying pair shares at least one block, so candidates come from
    * an equi-join on (block, value), never a cross join; verification
    * is one bit_count(xor) per candidate. */
  def imageNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame =
    hammingNearDupPairs(hashes, maxHamming)

  /** 16-bit-block pigeonhole join on any 64-bit perceptual hash column
    * named `phash` — shared by the image (dHash) and audio (envelope
    * hash) near-dup paths: at hamming ≤ 3, at least one of the four
    * blocks is untouched, so the block equi-join is exact, never a
    * cross product. */
  def hammingNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-block pigeonhole is exact only for hamming <= 3")
    val blocks = hashes.select(col("doc_id"), col("phash"),
      posexplode(array(
        shiftright(col("phash"), 48).bitwiseAND(65535),
        shiftright(col("phash"), 32).bitwiseAND(65535),
        shiftright(col("phash"), 16).bitwiseAND(65535),
        col("phash").bitwiseAND(65535))).as(Seq("blk", "v")))
    val a = blocks.select(col("doc_id").as("doc_a"), col("phash").as("ph_a"),
      col("blk"), col("v"))
    val b = blocks.select(col("doc_id").as("doc_b"), col("phash").as("ph_b"),
      col("blk"), col("v"))
    a.join(b, Seq("blk", "v"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Frame-sample a video payload: every `everyN`-th fixed-size byte
    * block (the stub codec's 64-byte "frame" convention), exploded to
    * one row per sampled frame. Pure column ops — the slicing runs in
    * whole-stage codegen with no opaque closure, and the explode
    * fan-out is bounded by payload size / frameBytes / everyN. A real
    * codec would swap the substring for a keyframe extractor with the
    * SAME output schema. */
  def sampleFrames(payloads: DataFrame, everyN: Int,
                   frameBytes: Int = 64): DataFrame = {
    // ceil(len / frameBytes): an exact-multiple payload has exactly
    // len/frameBytes frames (no empty trailing frame), and an empty
    // payload has 0 frames and emits no rows (also guards the
    // sequence(0, -1) reversal)
    val nFrames = ((length(col("payload")).cast("long") + lit(frameBytes - 1)) /
      lit(frameBytes)).cast("int")
    payloads.filter(col("modality") === "video")
      .select(col("doc_id"), col("payload"), nFrames.as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("n_frames"),
        posexplode(transform(
          filter(sequence(lit(0), col("n_frames") - 1), i => i % everyN === 0),
          i => col("payload").substr(i * frameBytes + 1, lit(frameBytes))))
          .as(Seq("sample_idx", "frame")))
      .select(col("doc_id"), col("n_frames"), col("sample_idx"),
        col("frame").cast("string").as("frame_text"),
        length(col("frame")).as("frame_bytes"))
  }

  /** Resized-payload record produced by the (stubbed) resizer. */
  case class ResizedPayload(doc_id: Long, width: Int, height: Int,
                            n_bytes_out: Int, sample_sum: Long)

  /** Batch "resize" to target dimensions — the same per-partition batch
    * shape as [[decodeFeatures]] (with Python codecs: mapInPandas over
    * arrow batches). The stub deterministically re-samples every
    * stride-th byte up to targetW·targetH output bytes; a real
    * implementation swaps `resizeOne` for an image scaler with the SAME
    * signature and batch iteration. */
  def resizePayloads(payloads: DataFrame, targetW: Int, targetH: Int): Dataset[ResizedPayload] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) => resizeOne(id, bytes, targetW, targetH) }
      }
  }

  private def resizeOne(id: Long, bytes: Array[Byte],
                        targetW: Int, targetH: Int): ResizedPayload = {
    val target = targetW * targetH
    val out =
      if (bytes.isEmpty) Array.empty[Byte]
      else {
        val stride = math.max(1, bytes.length / target)
        bytes.indices.by(stride).take(target).map(bytes(_)).toArray
      }
    ResizedPayload(id, targetW, targetH, out.length,
      out.map(b => (b & 0xff).toLong).sum)
  }
}
