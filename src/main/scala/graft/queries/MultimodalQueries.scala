package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): media as opaque binary
  * columns with typed metadata. The fixture plants REAL container bytes
  * (a PNG signature + IHDR chunk, same construction as m5), and the
  * decode step parses them back out of the raw byte array in a typed
  * Dataset `mapPartitions` batch — one iterator per partition, where a
  * real codec would amortize its setup. No image libraries exist in
  * this environment, so decode stops at the container header (the m5
  * expression query proves the same parse in pure SQL; pixel decode
  * would slot into the identical mapPartitions shape).
  */
object MultimodalQueries {

  /** Decoded-media metadata record: container validity, total bytes,
    * and the IHDR dimensions (null when the container is corrupt). */
  case class MediaDecoded(doc_id: Long, n_bytes: Long, is_png: Boolean,
      width: Option[Long], height: Option[Long], bit_depth: Option[Long])

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Real container-header decode over the raw bytes: PNG signature
    * check, then big-endian IHDR width(16-19)/height(20-23)/depth(24).
    * Mirrors m5's expression-level parse (MultimodalQueries m5) so the
    * DuckDB twin gates it exactly. */
  private[queries] def decodePng(docId: Long, bytes0: Array[Byte]): MediaDecoded = {
    // a NULL media blob (e.g. null source text) is just the corrupt
    // branch, not a crash
    val bytes = if (bytes0 == null) Array.empty[Byte] else bytes0
    var ok = bytes.length >= 26
    var i = 0
    while (ok && i < PngSig.length) { ok = bytes(i) == PngSig(i); i += 1 }
    def be32(off: Int): Long =
      ((bytes(off) & 0xFFL) << 24) | ((bytes(off + 1) & 0xFFL) << 16) |
        ((bytes(off + 2) & 0xFFL) << 8) | (bytes(off + 3) & 0xFFL)
    if (ok) MediaDecoded(docId, bytes.length.toLong, is_png = true,
      Some(be32(16)), Some(be32(20)), Some((bytes(24) & 0xFF).toLong))
    else MediaDecoded(docId, bytes.length.toLong, is_png = false, None, None, None)
  }

  /** JPEG frame-header record: container validity, SOF sample
    * precision/dimensions, and how many marker segments the walk
    * crossed to find them (null dims when the container is corrupt). */
  case class JpegMeta(doc_id: Long, is_jpeg: Boolean, bits: Option[Long],
      height: Option[Long], width: Option[Long], n_segments: Option[Long])

  /** Real JPEG marker walk over the raw bytes: SOI check, then
    * variable-length segment hopping (each non-standalone marker
    * carries a big-endian length) until a SOF0–SOF15 frame header
    * yields precision/height/width. Generic — it does not assume the
    * fixture's layout (the planted COM segment's length varies per
    * row, so a fixed-offset read would misparse). Public layout per
    * ITU-T T.81 §B.2. */
  private[queries] def decodeJpeg(docId: Long, b0: Array[Byte]): JpegMeta = {
    val b = if (b0 == null) Array.empty[Byte] else b0
    def u8(o: Int) = b(o) & 0xFF
    def be16(o: Int): Long = ((b(o) & 0xFFL) << 8) | (b(o + 1) & 0xFFL)
    if (b.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8)
      return JpegMeta(docId, is_jpeg = false, None, None, None, None)
    var i = 2; var nseg = 0L
    while (i + 4 <= b.length && u8(i) == 0xFF) {
      val m = u8(i + 1)
      if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
        // SOF frame header: len(2) precision(1) height(2) width(2)
        if (i + 9 > b.length)
          return JpegMeta(docId, is_jpeg = true, None, None, None, Some(nseg))
        return JpegMeta(docId, is_jpeg = true, Some((b(i + 4) & 0xFF).toLong),
          Some(be16(i + 5)), Some(be16(i + 7)), Some(nseg + 1))
      } else if (m == 0xD9 || m == 0xDA) {
        // EOI / SOS — entropy-coded data follows; stop walking
        return JpegMeta(docId, is_jpeg = true, None, None, None, Some(nseg))
      } else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
        i += 2 // standalone markers carry no length field
      } else {
        i += 2 + be16(i + 2).toInt; nseg += 1
      }
    }
    JpegMeta(docId, is_jpeg = true, None, None, None, Some(nseg))
  }

  /** EXIF metadata record (m10): whether an APP1/Exif segment exists,
    * the TIFF byte order ("II" little / "MM" big — the field every
    * real-world EXIF parser must dispatch on), how many IFD0 entries
    * actually fit inside the segment (a truncated IFD parses fewer
    * than it declares), and the two inline-value tags the fixture
    * plants: ImageWidth (0x0100, LONG) and Orientation (0x0112,
    * SHORT). */
  case class ExifMeta(doc_id: Long, has_exif: Boolean,
      byte_order: Option[String], n_entries: Option[Long],
      width: Option[Long], orientation: Option[Long])

  /** JPEG marker walk to APP1/"Exif\0\0", then a real TIFF IFD parse
    * (public layout per TIFF 6.0 / EXIF 2.3): byte-order mark
    * dispatches every subsequent read (II = little, MM = big), magic
    * 42 validates the header, the IFD0 offset is RELATIVE TO THE TIFF
    * ORIGIN (the classic off-by-APP1 bug), and entries are 12 bytes —
    * tag, type, count, then a 4-byte value field holding SHORT/LONG
    * values inline. Entries past the segment's declared end are NOT
    * read even when the IFD count claims them (truncated-IFD degrade
    * branch: parse what fits, null what doesn't). A non-JPEG, a
    * missing APP1, a bad byte-order mark, or a bad magic each null out
    * progressively — degrade, don't die. */
  private[queries] def decodeExif(docId: Long, b0: Array[Byte]): ExifMeta = {
    val b = if (b0 == null) Array.empty[Byte] else b0
    def u8(o: Int) = b(o) & 0xFF
    def be16(o: Int): Int = ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
    val none = ExifMeta(docId, has_exif = false, None, None, None, None)
    if (b.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return none
    var i = 2
    while (i + 4 <= b.length && u8(i) == 0xFF) {
      val m = u8(i + 1)
      if (m == 0xD9 || m == 0xDA) return none // entropy data: no EXIF found
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i += 2
      else {
        val segEnd = i + 2 + be16(i + 2)
        if (m == 0xE1 && i + 10 <= b.length && u8(i + 4) == 'E' &&
            u8(i + 5) == 'x' && u8(i + 6) == 'i' && u8(i + 7) == 'f' &&
            u8(i + 8) == 0 && u8(i + 9) == 0) {
          val t = i + 10 // TIFF origin: all offsets below are t-relative
          val end = math.min(segEnd, b.length)
          if (t + 8 > end) return ExifMeta(docId, has_exif = true, None, None, None, None)
          val le = u8(t) == 0x49 && u8(t + 1) == 0x49
          val bigE = u8(t) == 0x4D && u8(t + 1) == 0x4D
          def r16(o: Int): Long =
            if (le) (u8(o) | (u8(o + 1) << 8)).toLong else be16(o).toLong
          def r32(o: Int): Long =
            if (le) r16(o) | (r16(o + 2) << 16) else (r16(o) << 16) | r16(o + 2)
          if (!(le || bigE) || r16(t + 2) != 42L)
            return ExifMeta(docId, has_exif = true, None, None, None, None)
          val bo = if (le) "II" else "MM"
          val ifd = t + r32(t + 4).toInt
          if (ifd < t || ifd + 2 > end)
            return ExifMeta(docId, has_exif = true, Some(bo), None, None, None)
          val declared = r16(ifd).toInt
          var width: Option[Long] = None; var orient: Option[Long] = None
          var parsed = 0L; var j = 0
          while (j < declared && ifd + 2 + (j + 1) * 12 <= end) {
            val e = ifd + 2 + j * 12
            val tag = r16(e); val typ = r16(e + 2)
            val v: Option[Long] =
              if (typ == 3L) Some(r16(e + 8))      // SHORT: first 2 bytes
              else if (typ == 4L) Some(r32(e + 8)) // LONG: all 4 bytes
              else None
            if (tag == 0x0100L) width = v
            else if (tag == 0x0112L) orient = v
            parsed += 1; j += 1
          }
          return ExifMeta(docId, has_exif = true, Some(bo), Some(parsed), width, orient)
        }
        i = segEnd
      }
    }
    none
  }

  /** m10's planted container: SOI, a VARIABLE-length COM segment (so
    * nothing sits at a fixed offset), then APP1/"Exif\0\0" with a TIFF
    * IFD0 of two inline-value entries — ImageWidth (LONG) and
    * Orientation (SHORT) — alternating the byte order per row (every
    * 3rd row MM big-endian, else II little-endian: same VALUES, fully
    * different byte layout, so only a parser that actually dispatches
    * on the BOM round-trips both). Every 13th row truncates the
    * segment after the first entry while the IFD still DECLARES two
    * (truncated-IFD branch); every 17th row is headerless text
    * (corrupt branch). */
  private def exifMedia: org.apache.spark.sql.Column = {
    // pmod — the pad is a byte count; see m7's note
    val pad = (pmod(col("doc_id"), lit(19)) + 4).cast("int")
    val w = (lit(200) + col("doc_id") % 4000).cast("int")
    val o = (lit(1) + col("doc_id") % 8).cast("int")
    val wbe = lpad(hex(w), 8, "0")
    val wle = concat(substring(wbe, 7, 2), substring(wbe, 5, 2),
      substring(wbe, 3, 2), substring(wbe, 1, 2))
    val obe = lpad(hex(o), 4, "0")
    val ole = concat(substring(obe, 3, 2), substring(obe, 1, 2))
    val mm = col("doc_id") % 3 === 0
    val trunc = col("doc_id") % 13 === 0
    val tiffHdr = when(mm, lit("4D4D002A000000080002"))
      .otherwise(lit("49492A00080000000200"))
    val entry1 = when(mm, concat(lit("01000004" + "00000001"), wbe))
      .otherwise(concat(lit("00010400" + "01000000"), wle))
    val entry2 = when(mm, concat(lit("01120003" + "00000001"), obe, lit("0000")))
      .otherwise(concat(lit("12010300" + "01000000"), ole, lit("0000")))
    val header = concat(
      lit("FFD8FFFE"), lpad(hex(pad + 2), 4, "0"),
      expr("repeat('41', CAST(pmod(doc_id, 19) + 4 AS INT))"),
      lit("FFE1"), when(trunc, lit("001E")).otherwise(lit("002E")),
      lit("457869660000"), tiffHdr, entry1,
      when(trunc, lit("")).otherwise(concat(entry2, lit("00000000"))),
      lit("FFD9"))
    when(col("doc_id") % 17 === 0, col("text").cast("binary"))
      .otherwise(concat(unhex(header), col("text").cast("binary")))
  }

  /** MP4/ISO-BMFF metadata record: container validity (ftyp first),
    * major brand, mvhd timescale, derived duration in ms, trak count,
    * and how many top-level boxes the walk crossed (a misread size —
    * especially the 64-bit largesize branch — derails the walk and
    * changes this count, so the gate pins the walk itself). */
  case class Mp4Meta(doc_id: Long, is_mp4: Boolean, brand: Option[String],
      timescale: Option[Long], duration_ms: Option[Long],
      n_tracks: Option[Long], n_boxes: Option[Long])

  /** Generic ISO-BMFF box walk (public layout per ISO/IEC 14496-12):
    * top-level boxes are (size:be32, type:4cc) with two escapes — size
    * == 1 means a 64-bit largesize follows the type (the form any file
    * past 4 GiB uses for mdat, so a 100 TB video corpus hits it
    * constantly), size == 0 means the box runs to EOF. The walk skips
    * unknown boxes by size (it does NOT assume the fixture's layout),
    * descends into moov for the mvhd header (version 0 and 1 field
    * widths both handled) and the trak count, and a truncated or
    * undersized box stops the walk with whatever parsed so far —
    * degrade, don't die. */
  private[graft] def decodeMp4(docId: Long, b0: Array[Byte]): Mp4Meta = {
    val b = if (b0 == null) Array.empty[Byte] else b0
    def be32(o: Long): Long =
      ((b(o.toInt) & 0xFFL) << 24) | ((b(o.toInt + 1) & 0xFFL) << 16) |
        ((b(o.toInt + 2) & 0xFFL) << 8) | (b(o.toInt + 3) & 0xFFL)
    def be64(o: Long): Long = (be32(o) << 32) | be32(o + 4)
    def typ(o: Long): String =
      new String(b, o.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (b.length < 8 || typ(4) != "ftyp")
      return Mp4Meta(docId, is_mp4 = false, None, None, None, None, None)
    var brand: Option[String] = None
    var ts: Option[Long] = None
    var durMs: Option[Long] = None
    var ntr = 0L; var nbox = 0L
    var i = 0L; var ok = true
    while (ok && i + 8 <= b.length) {
      val sz0 = be32(i)
      val t = typ(i + 4)
      val (hdr, sz) =
        if (sz0 == 1 && i + 16 <= b.length) (16L, be64(i + 8))
        else if (sz0 == 0) (8L, b.length - i) // box extends to EOF
        else (8L, sz0)
      if (sz < hdr || i + sz > b.length) ok = false // truncated: stop
      else {
        nbox += 1
        t match {
          case "ftyp" if sz >= 12 => brand = Some(typ(i + 8))
          case "moov" =>
            var j = i + hdr
            var cok = true
            while (cok && j + 8 <= i + sz) {
              val csz0 = be32(j)
              val ct = typ(j + 4)
              val (chdr, csz) =
                if (csz0 == 1 && j + 16 <= i + sz) (16L, be64(j + 8))
                else (8L, csz0)
              if (csz < chdr || j + csz > i + sz) cok = false
              else {
                ct match {
                  case "mvhd" if csz >= chdr + 4 =>
                    val v = b((j + chdr).toInt) & 0xFF
                    val p = j + chdr + 4 // past version + flags
                    if (v == 1 && p + 28 <= j + csz) {
                      // v1: creation(8) modification(8) ts(4) dur(8)
                      val t0 = be32(p + 16)
                      if (t0 > 0) { ts = Some(t0); durMs = Some(be64(p + 20) * 1000L / t0) }
                    } else if (v == 0 && p + 16 <= j + csz) {
                      // v0: creation(4) modification(4) ts(4) dur(4)
                      val t0 = be32(p + 8)
                      if (t0 > 0) { ts = Some(t0); durMs = Some(be32(p + 12) * 1000L / t0) }
                    }
                  case "trak" => ntr += 1
                  case _ =>
                }
                j += csz
              }
            }
          case _ =>
        }
        i += sz
      }
    }
    Mp4Meta(docId, is_mp4 = true, brand, ts, durMs, Some(ntr), Some(nbox))
  }

  /** PDF structural metadata: header validity/version, page count from
    * the /Type /Pages node, object count from the xref subsection
    * header, the content stream's /Length, and whether the startxref
    * pointer actually lands on the xref table (the structural-
    * integrity bit an ingest pipeline gates on before dispatching to a
    * real text extractor). */
  case class PdfMeta(doc_id: Long, is_pdf: Boolean, version: Option[String],
      n_pages: Option[Long], n_objects: Option[Long],
      stream_len: Option[Long], xref_ok: Option[Boolean])

  /** Real PDF structural walk over the raw bytes (public layout per
    * ISO 32000-1): `%PDF-1.x` header; the LAST `startxref` (the spec's
    * rule — incremental updates append trailers, and the planted
    * payload may contain the token) dereferenced to the byte offset it
    * names, which must hold the `xref` keyword for xref_ok — the
    * planted comment line, kids list, and payload all SHIFT the table
    * per row, so only correct pointer arithmetic lands; the subsection
    * header `0 K` gives the object count; the first `/Type/Pages`
    * node's `/Count` gives pages; the first `/Length` the content
    * stream size. Every scan is bounds-checked; anything missing
    * degrades to None (truncation branches MultimodalSpec-pinned). */
  private[graft] def decodePdf(docId: Long, b0: Array[Byte]): PdfMeta = {
    val b = if (b0 == null) Array.empty[Byte] else b0
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    def str(o: Int, len: Int): String =
      if (o >= 0 && o + len <= b.length) new String(b, o, len, ascii) else ""
    def find(pat: String, from: Int): Int = {
      val p = pat.getBytes(ascii)
      var i = math.max(0, from)
      while (i + p.length <= b.length) {
        var j = 0
        while (j < p.length && b(i + j) == p(j)) j += 1
        if (j == p.length) return i
        i += 1
      }
      -1
    }
    def rfind(pat: String): Int = {
      val p = pat.getBytes(ascii)
      var i = b.length - p.length
      while (i >= 0) {
        var j = 0
        while (j < p.length && b(i + j) == p(j)) j += 1
        if (j == p.length) return i
        i -= 1
      }
      -1
    }
    // bounded decimal parse: at most 15 digits, None if none present
    def digits(o: Int): Option[Long] = {
      var i = o; var v = 0L; var n = 0
      while (i < b.length && n < 15 && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1; n += 1
      }
      if (n > 0) Some(v) else None
    }
    if (b.length < 9 || str(0, 5) != "%PDF-")
      return PdfMeta(docId, is_pdf = false, None, None, None, None, None)
    val version = Some(str(5, 3))
    val pagesAt = find("/Type/Pages", 0)
    val nPages =
      if (pagesAt < 0) None
      else { val c = find("/Count ", pagesAt); if (c < 0) None else digits(c + 7) }
    val lenAt = find("/Length ", 0)
    val streamLen = if (lenAt < 0) None else digits(lenAt + 8)
    val sx = rfind("startxref")
    val (nObjects, xrefOk) =
      if (sx < 0) (None, Some(false))
      else digits(sx + 10) match {
        case Some(off) if off + 7 <= b.length && str(off.toInt, 5) == "xref\n" =>
          // subsection header "0 K": object 0 is the free-list head
          (if (str(off.toInt + 5, 2) == "0 ") digits(off.toInt + 7) else None,
            Some(true))
        case _ => (None, Some(false))
      }
    PdfMeta(docId, is_pdf = true, version, nPages, nObjects, streamLen, xrefOk)
  }

  private def hexOf(s: String): String =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      .map("%02X".format(_)).mkString

  case class GifMeta(doc_id: Long, is_gif: Boolean, version: Option[String],
      width: Option[Long], height: Option[Long], n_colors: Option[Long],
      n_frames: Option[Long], delay_cs: Option[Long])

  /** Real GIF structural walk (public layout per GIF89a spec): header
    * + logical screen descriptor (LE u16 dims, packed GCT byte), skip
    * the variable global color table, then the block walk — 0x21
    * extensions skipped by their sub-block chains (capturing the first
    * Graphic Control Extension's delay), 0x2C image descriptors
    * counted as frames (local color table + LZW data sub-blocks
    * skipped), 0x3B trailer stops. Every advance is bounds-checked;
    * truncation degrades to the frames counted so far, and an unknown
    * block byte stops the walk (MultimodalSpec pins both). */
  private[graft] def decodeGif(docId: Long, b0: Array[Byte]): GifMeta = {
    val b = if (b0 == null) Array.empty[Byte] else b0
    def u8(o: Int) = b(o) & 0xFF
    def le16(o: Int): Long = (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8)
    val ver = if (b.length >= 6)
      new String(b, 3, 3, java.nio.charset.StandardCharsets.US_ASCII) else ""
    if (b.length < 13 || u8(0) != 'G' || u8(1) != 'I' || u8(2) != 'F' ||
        (ver != "89a" && ver != "87a"))
      return GifMeta(docId, is_gif = false, None, None, None, None, None, None)
    val w = le16(6); val h = le16(8)
    val packed = u8(10)
    val nColors = if ((packed & 0x80) != 0) 1L << ((packed & 7) + 1) else 0L
    var i = 13 + (if ((packed & 0x80) != 0) 3 * (1 << ((packed & 7) + 1)) else 0)
    var frames = 0L
    var delay: Option[Long] = None
    var walking = true
    def skipSubBlocks(from: Int): Int = {
      var j = from
      while (j < b.length && u8(j) != 0) j += 1 + u8(j)
      j + 1
    }
    while (walking && i < b.length && u8(i) != 0x3B) {
      u8(i) match {
        case 0x21 if i + 2 <= b.length =>
          if (i + 7 <= b.length && u8(i + 1) == 0xF9 && u8(i + 2) == 4 &&
              delay.isEmpty)
            delay = Some(le16(i + 4))
          i = skipSubBlocks(i + 2)
        case 0x2C if i + 10 <= b.length =>
          frames += 1
          val p2 = u8(i + 9)
          val lct = if ((p2 & 0x80) != 0) 3 * (1 << ((p2 & 7) + 1)) else 0
          i = skipSubBlocks(i + 10 + lct + 1)
        case _ => walking = false
      }
    }
    GifMeta(docId, is_gif = true, Some(ver), Some(w), Some(h),
      Some(nColors), Some(frames), delay)
  }

  /** The m12 fixture plant: a REAL GIF container — header version
    * cycled 89a/87a, LE dims, a global color table whose size VARIES
    * per row (so every later block offset shifts), and 1-4 frames each
    * carrying (on 89a rows) a Graphic Control Extension with a planted
    * delay plus an image descriptor with an LZW data sub-block chain.
    * Every 17th doc is headerless (corrupt branch). */
  private[graft] def gifMedia: org.apache.spark.sql.Column = {
    def le16(v: org.apache.spark.sql.Column) = {
      val x = v.cast("long")
      concat(lpad(hex(x % 256), 2, "0"), lpad(hex((x / 256) % 256), 2, "0"))
    }
    val ver = when(col("doc_id") % 2 === 0, lit(hexOf("89a")))
      .otherwise(lit(hexOf("87a")))
    val width = lit(16) + col("doc_id") % 1024
    val height = lit(16) + col("doc_id") % 768
    val hasGct = col("doc_id") % 3 =!= 0
    // packed: GCT flag + color resolution 7 + size bits (doc_id % 8)
    val packed = when(hasGct,
      lpad(hex(lit(240) + col("doc_id") % 8), 2, "0")).otherwise(lit("00"))
    val gct = expr("repeat('00', CASE WHEN doc_id % 3 != 0 THEN " +
      "CAST(3 * shiftleft(1, CAST(doc_id % 8 + 1 AS INT)) AS INT) ELSE 0 END)")
    val gce = when(col("doc_id") % 2 === 0,
      concat(lit("21F904" + "00"), le16(col("doc_id") % 500), lit("00" + "00")))
      .otherwise(lit(""))
    val imgDesc = concat(lit("2C" + "00000000"), le16(width), le16(height), lit("00"))
    val lzwMin = lpad(hex(lit(2) + col("doc_id") % 7), 2, "0")
    val sub = concat(lpad(hex(lit(1) + col("doc_id") % 100), 2, "0"),
      expr("repeat('AB', CAST(1 + doc_id % 100 AS INT))"), lit("00"))
    val frame = concat(gce, imgDesc, lzwMin, sub)
    val frames = concat((0 until 4).map(k =>
      when(col("doc_id") % 4 >= k, frame).otherwise(lit(""))): _*)
    when(col("doc_id") % 17 === 0, col("text").cast("binary"))
      .otherwise(unhex(concat(lit("474946"), ver, le16(width), le16(height),
        packed, lit("00" + "00"), gct, frames, lit("3B"))))
  }

  /** The m11 fixture plant: a REAL minimal PDF over the text bytes —
    * `%PDF-1.4`..`1.7` header; a binary comment line whose length
    * VARIES per row (so every later object offset shifts and a
    * fixed-offset read misparses — m9's free-box trick); a catalog, a
    * /Type /Pages node with 1-5 kids, that many page objects, and a
    * content stream object carrying the document text as its payload;
    * then a byte-correct xref table (every entry's 10-digit offset
    * computed from the same arithmetic the twin replays) and a trailer
    * whose startxref names the table's true byte offset. Every 17th
    * doc is headerless (corrupt branch). */
  private[graft] def pdfMedia: org.apache.spark.sql.Column = {
    def asciiHex(c: org.apache.spark.sql.Column) = hex(c.cast("string").cast("binary"))
    def digitHex(d: org.apache.spark.sql.Column) = hex(lit(48) + d) // one digit 0-9
    val n = (col("doc_id") % 5 + 1).cast("int") // pages
    val cpad = (col("doc_id") % 23 + 4).cast("int") // comment bytes
    val L = length(col("text").cast("binary"))
    val header = concat(lit(hexOf("%PDF-1.")),
      digitHex((col("doc_id") % 4 + 4).cast("int")), lit(hexOf("\n")))
    val comment = concat(lit(hexOf("%")),
      expr("repeat('E2', CAST(doc_id % 23 + 4 AS INT))"), lit(hexOf("\n")))
    val off1 = cpad + 11
    val obj1 = lit(hexOf("1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n"))
    val off2 = off1 + 43
    val kids = element_at(array((1 to 5).map(k =>
      lit(hexOf((3 until 3 + k).map(i => s"$i 0 R").mkString(" ")))): _*), n)
    val obj2 = concat(lit(hexOf("2 0 obj<</Type/Pages/Kids[")), kids,
      lit(hexOf("]/Count ")), digitHex(n), lit(hexOf(">>endobj\n")))
    val off3 = off2 + n * 6 + 43
    val pageObjs = element_at(array((1 to 5).map(k =>
      lit(hexOf((3 until 3 + k)
        .map(i => s"$i 0 obj<</Type/Page/Parent 2 0 R>>endobj\n").mkString))): _*), n)
    val offS = off3 + n * 41
    val streamObj = concat(digitHex(n + 3), lit(hexOf(" 0 obj<</Length ")),
      asciiHex(L), lit(hexOf(">>stream\n")), hex(col("text").cast("binary")),
      lit(hexOf("\nendstream endobj\n")))
    val xrefOff = offS.cast("long") + 44 + length(L.cast("string")) + L
    def entry(off: org.apache.spark.sql.Column) =
      concat(asciiHex(lpad(off.cast("string"), 10, "0")), lit(hexOf(" 00000 n \n")))
    val xref = concat(Seq(
      lit(hexOf("xref\n0 ")), digitHex(n + 4), lit(hexOf("\n")),
      lit(hexOf("0000000000 65535 f \n")),
      entry(off1), entry(off2)) ++
      (0 until 5).map(j => when(n > j, entry(off3 + j * 41)).otherwise(lit(""))) ++
      Seq(entry(offS)): _*)
    val trailer = concat(lit(hexOf("trailer<</Size ")), digitHex(n + 4),
      lit(hexOf("/Root 1 0 R>>\nstartxref\n")), asciiHex(xrefOff),
      lit(hexOf("\n%%EOF")))
    when(col("doc_id") % 17 === 0, col("text").cast("binary"))
      .otherwise(unhex(concat(header, comment, obj1, obj2, pageObjs,
        streamObj, xref, trailer)))
  }

  /** The m9 fixture plant: a REAL minimal ISO-BMFF container over the
    * text bytes — ftyp (brand cycled isom/mp42/avc1), a free box whose
    * size VARIES per row (so moov's offset shifts and a fixed-offset
    * read misparses), moov holding a spec-complete 108-byte version-0
    * mvhd plus 1-3 empty trak boxes, and an mdat that every 5th doc
    * writes in the 64-bit LARGESIZE form (size=1 + 8-byte extended
    * size) — the escape a >4 GiB production mdat always uses. Every
    * 17th doc is headerless (corrupt branch). */
  private[graft] def mp4Media: org.apache.spark.sql.Column = {
    def be32(v: org.apache.spark.sql.Column) = lpad(hex(v.cast("long")), 8, "0")
    val brandHex = element_at(
      array(lit("69736F6D"), lit("6D703432"), lit("61766331")),
      (col("doc_id") % 3 + 1).cast("int"))
    // size 0x14 = 20: hdr(8) + brand(4) + minor(4) + one compatible(4)
    val ftyp = concat(lit("00000014"), lit("66747970"), brandHex,
      lit("00000000"), lit("69736F6D"))
    val pad = (col("doc_id") % 23).cast("int")
    val free = concat(be32(pad + 8), lit("66726565"), expr("repeat('00', CAST(doc_id % 23 AS INT))"))
    val timescale = lit(600) * (col("doc_id") % 4 + 1)
    val durTicks = lit(6000) + col("doc_id") % 90000
    val matrix = "000100000000000000000000" +
      "000000000001000000000000" + "000000000000000040000000"
    val mvhd = concat(lit("0000006C"), lit("6D766864"), lit("00000000"),
      lit("00000000"), lit("00000000"), be32(timescale), be32(durTicks),
      lit("00010000"), lit("0100"), lit("00" * 10), lit(matrix),
      lit("00" * 24), lit("00000002"))
    val ntrak = (col("doc_id") % 3 + 1).cast("int")
    val traks = expr("repeat('000000087472616B', CAST(doc_id % 3 + 1 AS INT))")
    val moov = concat(be32(lit(116) + ntrak * 8), lit("6D6F6F76"), mvhd, traks)
    val dataSize = length(col("text").cast("binary"))
    val mdatHdr = when(col("doc_id") % 5 === 0,
        concat(lit("00000001"), lit("6D646174"), lpad(hex(dataSize + 16), 16, "0")))
      .otherwise(concat(be32(dataSize + 8), lit("6D646174")))
    when(col("doc_id") % 17 === 0, col("text").cast("binary"))
      .otherwise(concat(unhex(concat(ftyp, free, moov, mdatHdr)),
        col("text").cast("binary")))
  }

  /** Windowed PCM energy over a RIFF/WAVE container: generic chunk
    * walk (word-aligned per the RIFF spec) to the `data` chunk, then
    * signed little-endian 16-bit samples squared-and-summed per
    * fixed-size window. Returns (doc_id, win, energy) rows; empty for
    * non-WAV bytes or payloads shorter than one window. */
  private[queries] def wavEnergy(docId: Long, b0: Array[Byte], winSize: Int): Seq[(Long, Long, Long)] = {
    val b = if (b0 == null) Array.empty[Byte] else b0 // null blob = corrupt branch
    def u8(o: Int) = b(o) & 0xFF
    def le32(o: Int): Long = (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
    if (b.length < 12 || u8(0) != 'R' || u8(1) != 'I' || u8(2) != 'F' || u8(3) != 'F' ||
        u8(8) != 'W' || u8(9) != 'A' || u8(10) != 'V' || u8(11) != 'E') return Nil
    var i = 12
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val sz = le32(i + 4).toInt
      if (id == "data") {
        val start = i + 8
        val n = math.max(0, math.min(sz, b.length - start)) / 2
        val nw = n / winSize
        return (0 until nw).map { w =>
          var e = 0L; var k = 0
          while (k < winSize) {
            val off = start + 2 * (w * winSize + k)
            val raw = (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
            val v = if (raw >= 32768) raw - 65536 else raw
            e += v.toLong * v; k += 1
          }
          (docId, w.toLong, e)
        }
      }
      i += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    Nil
  }

  /** The m6/m8 fixture plant: a REAL 44-byte RIFF/WAVE PCM header (LE
    * fields derived from doc_id, data size = the payload's byte
    * length) over the text bytes; every 17th doc left headerless to
    * exercise the corrupt branch. */
  private def wavMedia: org.apache.spark.sql.Column = {
    def le16(v: org.apache.spark.sql.Column) =
      concat(lpad(hex(v % 256), 2, "0"), lpad(hex((v.cast("long") / 256).cast("long") % 256), 2, "0"))
    def le32(v: org.apache.spark.sql.Column) = {
      val x = v.cast("long")
      concat(lpad(hex(x % 256), 2, "0"),
        lpad(hex((x / 256).cast("long") % 256), 2, "0"),
        lpad(hex((x / 65536).cast("long") % 256), 2, "0"),
        lpad(hex((x / 16777216).cast("long") % 256), 2, "0"))
    }
    val channels = lit(1) + col("doc_id") % 2
    val rate = lit(8000) * (lit(1) + col("doc_id") % 5)
    val blockAlign = channels * 2 // 16-bit PCM
    val byteRate = rate * blockAlign
    val dataSize = length(col("text").cast("binary"))
    val header = concat(lit("52494646"), le32(dataSize + 36), lit("57415645"),
      lit("666D7420"), lit("10000000"), lit("0100"), le16(channels),
      le32(rate), le32(byteRate), le16(blockAlign), le16(lit(16)),
      lit("64617461"), le32(dataSize))
    when(col("doc_id") % 17 === 0, col("text").cast("binary"))
      .otherwise(concat(unhex(header), col("text").cast("binary")))
  }

  val queries: Map[String, QueryFn] = Map(
    // ---- M9: MP4/ISO-BMFF box-walk metadata — the video leg of the
    // multimodal family (m1/m5 images, m6/m8 audio, m9 video
    // containers): a generic nested box walk in the m1/m7
    // mapPartitions shape parses ftyp brand, the moov/mvhd
    // timescale → duration_ms, and the track count from planted
    // containers whose box offsets SHIFT per row (variable-size free
    // box) and whose mdat exercises the 64-bit largesize escape every
    // 5th doc — the form any >4 GiB production media file uses, so a
    // walk that can't hop it derails (the gated n_boxes count would
    // change). DuckDB twin re-reads the fields at the arithmetic
    // offsets. Every 17th blob is headerless (corrupt branch);
    // truncation branches are MultimodalSpec-pinned. ----
    "m9_mp4_meta" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .filter(col("doc_id").isNotNull) // see m1's note
        .select(col("doc_id"), mp4Media.as("media"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) => decodeMp4(id, bytes) })
        .toDF()
        .orderBy("doc_id")
    }),

    // ---- M10: EXIF/TIFF IFD metadata — the image-metadata leg every
    // multimodal ingest runs before any pixel decode (orientation
    // decides whether the tensor needs a rotate; width feeds the
    // resize plan; camera-sourced vs synthetic filtering starts from
    // EXIF presence). The fixture plants a REAL APP1/Exif segment
    // behind a variable-length COM segment, alternating TIFF byte
    // order per row; the decode is the generic marker walk + a
    // BOM-dispatched IFD parse in the m1 mapPartitions shape. The
    // DuckDB twin rebuilds the planted hex and re-reads width and
    // orientation AT THE ARITHMETIC OFFSETS with the matching
    // endianness, so the gate proves the walk, the byte-order
    // dispatch, and the truncated-IFD bound all land exactly. ----
    "m10_exif_meta" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .filter(col("doc_id").isNotNull) // see m1's note
        .select(col("doc_id"), exifMedia.as("media"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) => decodeExif(id, bytes) })
        .toDF()
        .orderBy("doc_id")
    }),

    // ---- M11: PDF structural metadata — the document leg of the
    // multimodal family (text-pipeline corpora are PDF-heavy, and the
    // header/xref/page-count walk is the triage every ingest runs
    // before spending a real extractor on the file): header version,
    // /Type /Pages → /Count page count, xref object count, content-
    // stream /Length, and the startxref → xref pointer check — the
    // integrity bit that catches truncated/garbage PDFs. The planted
    // container is byte-real: a variable-length binary comment shifts
    // every object per row, and the xref table's 10-digit entries and
    // the startxref value are computed from the same offset arithmetic
    // the DuckDB twin replays — so a walk that mis-counts a single
    // byte anywhere flips xref_ok and the gate. m1 mapPartitions
    // shape; every 17th doc headerless (corrupt branch). ----
    "m11_pdf_meta" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .filter(col("doc_id").isNotNull) // see m1's note
        .select(col("doc_id"), pdfMedia.as("media"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) => decodePdf(id, bytes) })
        .toDF()
        .orderBy("doc_id")
    }),

    // ---- M12: GIF structural metadata — the animation leg of the
    // multimodal family (dims for the resize plan, frame count for
    // frame-sampling budgets, palette size and per-frame delay for
    // synthetic-vs-camera routing). The planted container is
    // byte-real and the global color table's size varies per row, so
    // every block offset shifts and only a correct walk lands; the
    // DuckDB twin rebuilds the hex, re-reads dims/palette at the
    // arithmetic offsets, and dereferences the first Graphic Control
    // Extension THROUGH its own re-read packed byte — a one-byte GCT
    // bookkeeping error in either engine lands the delay read on the
    // wrong bytes and flips the gate. m1 mapPartitions shape; every
    // 17th doc headerless (corrupt branch). ----
    "m12_gif_meta" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .filter(col("doc_id").isNotNull) // see m1's note
        .select(col("doc_id"), gifMedia.as("media"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) => decodeGif(id, bytes) })
        .toDF()
        .orderBy("doc_id")
    }),

    // ---- M8: audio feature extraction — windowed PCM energy over the
    // m6 fixture's REAL RIFF/WAVE container, treating the payload as
    // signed 16-bit LE samples: the honest no-codec slice of audio
    // featurization (VAD, silence trimming, and loudness normalization
    // all start from exactly this per-window energy), in the m1
    // mapPartitions shape a real DSP kernel would slot into. The walk
    // to the data chunk is generic (word-aligned RIFF chunks), not a
    // fixed 44-byte skip. All-integer energy keeps the DuckDB twin —
    // which re-reads the samples from hex — bit-exact. Every 17th doc
    // is headerless and yields no rows. ----
    "m8_audio_energy" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .filter(col("doc_id").isNotNull) // see m1's note
        .select(col("doc_id"), wavMedia.as("media"))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, bytes) => wavEnergy(id, bytes, 64) }
        .toDF("doc_id", "win", "energy")
        .orderBy("doc_id", "win")
    }),

    // ---- M7: JPEG frame-header decode — the fixture plants a REAL
    // JPEG container (SOI, a COM segment whose length VARIES per row,
    // then an SOF0 frame header with big-endian height/width derived
    // from doc_id), and the decode is a generic marker WALK in the m1
    // mapPartitions shape — fixed-offset reads would misparse because
    // the comment segment shifts the frame header per row. The DuckDB
    // twin re-parses the planted hex at the arithmetic offsets, so the
    // gate proves the walk lands exactly where the layout puts the
    // fields. Every 17th blob is headerless (corrupt branch). ----
    "m7_jpeg_meta" -> ((s, dir) => {
      import s.implicits._
      // pmod, not %: the COM payload length is a BYTE COUNT — a
      // negative doc_id would otherwise plant a negative declared
      // length (repeat('41', -16) = ''), derailing the marker walk
      // differently from the twin's offset arithmetic
      val comPay = (pmod(col("doc_id"), lit(23)) + 4).cast("int")
      val header = concat(lit("FFD8FFFE"), lpad(hex(comPay + 2), 4, "0"),
        expr("repeat('41', CAST(pmod(doc_id, 23) + 4 AS INT))"),
        lit("FFC0001108"),
        lpad(hex((lit(100) + col("doc_id") % 1000).cast("int")), 4, "0"),
        lpad(hex((lit(100) + col("doc_id") % 1900).cast("int")), 4, "0"),
        lit("03011100021101031101"))
      val media = when(col("doc_id") % 17 === 0, col("text").cast("binary"))
        .otherwise(concat(unhex(header), col("text").cast("binary")))
      Tables.documents(s, dir)
        // a media row without an id is unaddressable: the typed
        // encoder's Long cannot carry NULL, and no downstream join
        // could ever use the row — drop, don't crash
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id"), media.as("media"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) => decodeJpeg(id, bytes) })
        .toDF()
        .orderBy("doc_id")
    }),
    // ---- M1: binary media column → per-partition batch decode of the
    // planted PNG container → typed metadata, hash-gated against the
    // DuckDB hex-parse twin. Every 17th blob is left headerless to
    // exercise the corrupt branch (is_png false, null dims). ----
    "m1_media_meta" -> ((s, dir) => {
      import s.implicits._
      val w = (lit(100) + col("doc_id") % 1900).cast("int")
      val hgt = (lit(100) + col("doc_id") % 1000).cast("int")
      val header = concat(lit("89504E470D0A1A0A0000000D49484452"),
        lpad(hex(w), 8, "0"), lpad(hex(hgt), 8, "0"), lit("0806"))
      val media = when(col("doc_id") % 17 === 0, col("text").cast("binary"))
        .otherwise(concat(unhex(header), col("text").cast("binary")))
      Tables.documents(s, dir)
        // a media row without an id is unaddressable: the typed
        // encoder's Long cannot carry NULL, and no downstream join
        // could ever use the row — drop, don't crash
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id"), media.as("media"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) => decodePng(id, bytes) })
        .toDF()
        .orderBy("doc_id")
    }),

    // ---- M2: media byte accounting (pure expression → hash-gated) ----
    "m2_media_bytes" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          length(col("text").cast("binary")).as("n_bytes"),
          (length(col("text").cast("binary")) - length(col("text"))).as("multibyte_overhead"))
        .orderBy("doc_id")),

    // ---- M4: magic-byte format sniffing — classify each media blob by
    // its binary signature prefix (the integrity check a 100 TB media
    // pipeline runs to catch mislabeled/corrupt blobs before decode).
    // The fixture plants real container signatures (JPEG/PNG/GIF/RIFF/
    // PDF) cycled by doc_id, with every 17th blob left unsigned to
    // exercise the corrupt branch; sniffing compares the hex prefix —
    // pure codegen'd expressions, hash-gated. ----
    "m4_format_sniff" -> ((s, dir) => {
      // planted signature per doc (full header bytes written)...
      val plant = Seq("FFD8FFE0" -> "jpeg", "89504E47" -> "png",
        "47494638" -> "gif", "52494646" -> "riff", "25504446" -> "pdf")
      // ...sniffed by each format's REAL minimal magic (jpeg/gif are
      // 3-byte signatures; the 4th byte varies across subformats)
      val sniff = Seq("FFD8FF" -> "jpeg", "89504E47" -> "png",
        "474946" -> "gif", "52494646" -> "riff", "25504446" -> "pdf")
      val declared = element_at(
        array(plant.map(p => lit(p._2)): _*), (col("doc_id") % 5 + 1).cast("int"))
      val sigHex = element_at(
        array(plant.map(p => lit(p._1)): _*), (col("doc_id") % 5 + 1).cast("int"))
      val media = when(col("doc_id") % 17 === 0, col("text").cast("binary"))
        .otherwise(concat(unhex(sigHex), col("text").cast("binary")))
      val h = hex(media)
      val detected = sniff.foldRight(lit("unknown"): org.apache.spark.sql.Column) {
        case ((magic, fmt), acc) => when(h.startsWith(magic), lit(fmt)).otherwise(acc)
      }
      Tables.documents(s, dir)
        .select(col("doc_id"), declared.as("declared"), detected.as("detected"),
          (declared === detected).as("signature_ok"))
        .orderBy("doc_id")
    }),

    // ---- M5: container-header metadata parse — the planted blobs carry
    // a REAL PNG header (8-byte signature + IHDR chunk with big-endian
    // width/height/bit-depth derived from doc_id), and the query parses
    // the dimensions back out of the raw bytes: signature check, then
    // base-16 field extraction at the IHDR offsets. This is the honest
    // no-codec slice of image decode — header metadata really is parsed
    // like this at scale (pure codegen'd expressions, no UDF) — while
    // pixel decode stays the declared m1 stub. Every 17th blob is left
    // headerless to exercise the corrupt branch (null dims). ----
    "m5_image_dims" -> ((s, dir) => {
      val w = (lit(100) + col("doc_id") % 1900).cast("int")
      val hgt = (lit(100) + col("doc_id") % 1000).cast("int")
      // 89504E470D0A1A0A = PNG signature; 0000000D = IHDR length;
      // 49484452 = "IHDR"; then width(4) height(4) depth(1) color(1)
      val header = concat(lit("89504E470D0A1A0A0000000D49484452"),
        lpad(hex(w), 8, "0"), lpad(hex(hgt), 8, "0"), lit("0806"))
      val media = when(col("doc_id") % 17 === 0, col("text").cast("binary"))
        .otherwise(concat(unhex(header), col("text").cast("binary")))
      val hs = hex(media)
      val isPng = hs.startsWith("89504E470D0A1A0A")
      Tables.documents(s, dir)
        .select(col("doc_id"), isPng.as("is_png"),
          when(isPng, conv(hs.substr(33, 8), 16, 10).cast("long")).as("width"),
          when(isPng, conv(hs.substr(41, 8), 16, 10).cast("long")).as("height"),
          when(isPng, conv(hs.substr(49, 2), 16, 10).cast("long")).as("bit_depth"))
        .orderBy("doc_id")
    }),

    // ---- M13: resize/decode PLANNING — the budgeting step a 100 TB
    // image pipeline runs BEFORE spending GPU decode: parse real
    // container dims (m5's PNG header bytes), derive the fit-within-224
    // target preserving aspect ratio in exact integer arithmetic
    // (out = dim·224 div max(w,h), downscale only — a smaller image
    // passes through), and the post-decode byte budget out_w·out_h·3
    // the batcher packs against. Pure codegen'd expressions, zero
    // shuffle — the plan row is what routes each blob to a decode
    // batch without touching payload bytes. Corrupt rows plan null. ----
    "m13_resize_plan" -> ((s, dir) => {
      val w = (lit(100) + col("doc_id") % 1900).cast("int")
      val hgt = (lit(100) + col("doc_id") % 1000).cast("int")
      val header = concat(lit("89504E470D0A1A0A0000000D49484452"),
        lpad(hex(w), 8, "0"), lpad(hex(hgt), 8, "0"), lit("0806"))
      val media = when(col("doc_id") % 17 === 0, col("text").cast("binary"))
        .otherwise(concat(unhex(header), col("text").cast("binary")))
      val hs = hex(media)
      val isPng = hs.startsWith("89504E470D0A1A0A")
      Tables.documents(s, dir)
        .select(col("doc_id"), isPng.as("is_png"),
          when(isPng, conv(hs.substr(33, 8), 16, 10).cast("long")).as("width"),
          when(isPng, conv(hs.substr(41, 8), 16, 10).cast("long")).as("height"))
        .withColumn("needs_resize",
          when(col("is_png"), greatest(col("width"), col("height")) > 224L))
        .withColumn("out_w", when(col("needs_resize"),
            expr("width * 224 div greatest(width, height)"))
          .otherwise(col("width")))
        .withColumn("out_h", when(col("needs_resize"),
            expr("height * 224 div greatest(width, height)"))
          .otherwise(col("height")))
        .withColumn("out_bytes", col("out_w") * col("out_h") * 3L)
        .orderBy("doc_id")
    }),

    // ---- M6: audio container metadata — the fixture plants a REAL
    // 44-byte RIFF/WAVE header (PCM fmt chunk with little-endian
    // channels/sample-rate/bits derived from doc_id, data size = the
    // payload's byte length) and the query parses the fields back out:
    // signature checks at RIFF(0)/WAVE(8), then LE multi-byte reads at
    // the fmt-chunk offsets, plus the derived duration_ms =
    // samples·1000 div rate — all pure codegen'd expressions over the
    // hex encoding (the audio twin of m5's PNG IHDR parse; a sample
    // decoder would slot into m1's mapPartitions shape). Every 17th
    // blob is headerless to exercise the corrupt branch. ----
    "m6_wav_meta" -> ((s, dir) => {
      // header-only hex: every field this query reads lives in the
      // 44-byte RIFF/WAVE header (the last, dataSize, at bytes 40-43),
      // so hex the first 44 bytes instead of the whole blob — hexing
      // multi-KB payloads to read a fixed header doubled the query's
      // cost for nothing (the DuckDB twin reads the same offsets, so
      // truncation cannot change any output)
      val hs = hex(substring(wavMedia, 1, 44))
      // LE reads from the hex string: byte o (0-based) starts at char
      // o*2+1; value = Σ byte_i · 256^i
      def rb(byteOff: Int) = conv(hs.substr(byteOff * 2 + 1, 2), 16, 10).cast("long")
      def rle16(o: Int) = rb(o) + rb(o + 1) * 256
      def rle32(o: Int) = rb(o) + rb(o + 1) * 256 + rb(o + 2) * 65536 + rb(o + 3) * 16777216
      val isWav = hs.startsWith("52494646") && hs.substr(17, 8) === lit("57415645")
      // duration_ms = (dataSize div blockAlign) · 1000 div rate — all
      // integer-exact (floorDiv on positives ≡ truncation)
      val nSamples = floor(rle32(40) / rle16(32)).cast("long")
      Tables.documents(s, dir)
        .select(col("doc_id"), isWav.as("is_wav"),
          when(isWav, rle16(22)).as("channels"),
          when(isWav, rle32(24)).as("sample_rate"),
          when(isWav, rle16(34)).as("bits"),
          when(isWav, floor(nSamples * 1000 / rle32(24)).cast("long")).as("duration_ms"))
        .orderBy("doc_id")
    }),

    // ---- M3: frame sampling — treat the media bytes as a "video" and
    // cut fixed-size frames at a fixed stride (one input row → many
    // frame rows). Pure byte slicing, so the whole explode is
    // expression-level (codegen'd) and hash-gated; a real codec would
    // slot into the same shape via mapPartitions (see M1). ----
    "m3_frame_sample" -> ((s, dir) => {
      val frameSize = 32
      val stride = 100
      val media = col("text").cast("binary")
      val nFrames = greatest(
        floor((length(media) - frameSize) / stride) + 1, lit(0))
      Tables.documents(s, dir)
        .select(col("doc_id"), media.as("media"), nFrames.as("n_frames"))
        .filter(col("n_frames") > 0)
        .select(col("doc_id"),
          // fingerprint the frame via its hex encoding — DuckDB 1.0 has
          // no BLOB substring, but both engines agree on uppercase hex,
          // so md5(hex(bytes)) is cross-engine comparable
          posexplode(transform(sequence(lit(0), col("n_frames") - 1),
            i => md5(hex(col("media").substr(i * stride + 1, lit(frameSize)))))))
        .toDF("doc_id", "frame_no", "frame_md5")
        .orderBy("doc_id", "frame_no")
    })
  )

  val oracle: Map[String, String] = Map(
    // m9's twin rebuilds the planted container hex and re-reads brand /
    // timescale / duration at the ARITHMETIC offsets (ftyp 24 + free
    // 8+pad + moov header 8 + mvhd field layout), so the gate checks
    // the engine's generic box walk — including the largesize hop on
    // every 5th mdat — lands exactly where the per-row layout puts the
    // fields. is_mp4 is the same byte-4 'ftyp' test the engine runs.
    // m10's twin rebuilds the planted hex and re-reads the width and
    // orientation value fields at the ARITHMETIC offsets ((34+pad) and
    // (46+pad) bytes, pad = the COM segment's variable length) with
    // the row's declared endianness — big-endian fold for MM rows,
    // byte-reversed combine for II rows — so a decoder that ignored
    // the BOM or mis-walked the COM segment hash-mismatches.
    // m11: the twin rebuilds the planted PDF hex byte for byte (the
    // constant pieces are the SAME hexOf literals the fixture uses;
    // the variable pieces — version digit, comment pad, kids list,
    // xref entry offsets, startxref — are recomputed from the doc_id
    // arithmetic) and then CHECKS the startxref pointer against its
    // own hex, so a one-byte error in either engine's offset
    // bookkeeping flips xref_ok and the hash. Fixture contract (shared
    // with m7/m9/m10's magic-byte twins): a corrupt-slot document
    // whose RAW text itself begins '%PDF-' would satisfy the twin's
    // prefix check while the engine parses the actual bytes — corrupt
    // slots carry non-container text on the gated fixtures, and the
    // hostile sweeps (which may violate this) are no-crash-only.
    // m12's twin rebuilds the planted GIF hex (same arithmetic), then
    // re-reads width/height/palette at fixed offsets and the first
    // GCE's delay at the offset its OWN packed byte implies — the
    // pointer-integrity discipline of m9/m11 applied to the GCT shift.
    "m12_gif_meta" -> {
      def byteAt(k: String) =
        s"CAST(strpos('0123456789ABCDEF', substring(hs, CAST($k AS INT), 1)) - 1 AS BIGINT) * 16 + " +
          s"(strpos('0123456789ABCDEF', substring(hs, CAST(($k) + 1 AS INT), 1)) - 1)"
      def le16(v: String) =
        s"lpad(hex(CAST(($v) % 256 AS INT)), 2, '0') || lpad(hex(CAST(($v) // 256 % 256 AS INT)), 2, '0')"
      s"""WITH m AS (SELECT doc_id,
         |   CASE WHEN doc_id % 17 = 0 THEN hex(encode(text))
         |     ELSE '474946' ||
         |       CASE WHEN doc_id % 2 = 0 THEN '383961' ELSE '383761' END ||
         |       ${le16("16 + doc_id % 1024")} || ${le16("16 + doc_id % 768")} ||
         |       CASE WHEN doc_id % 3 <> 0
         |         THEN lpad(hex(CAST(240 + doc_id % 8 AS INT)), 2, '0')
         |         ELSE '00' END || '0000' ||
         |       repeat('00', CASE WHEN doc_id % 3 <> 0
         |         THEN CAST(3 * (1 << CAST(doc_id % 8 + 1 AS INT)) AS INT)
         |         ELSE 0 END) ||
         |       repeat(
         |         CASE WHEN doc_id % 2 = 0 THEN '21F904' || '00' ||
         |           ${le16("doc_id % 500")} || '0000' ELSE '' END ||
         |         '2C' || '00000000' || ${le16("16 + doc_id % 1024")} ||
         |         ${le16("16 + doc_id % 768")} || '00' ||
         |         lpad(hex(CAST(2 + doc_id % 7 AS INT)), 2, '0') ||
         |         lpad(hex(CAST(1 + doc_id % 100 AS INT)), 2, '0') ||
         |         repeat('AB', CAST(1 + doc_id % 100 AS INT)) || '00',
         |         CAST(1 + doc_id % 4 AS INT)) || '3B' END AS hs
         |  FROM documents),
         | p AS (SELECT doc_id, hs,
         |   COALESCE(len(hs) >= 26 AND substring(hs, 1, 6) = '474946'
         |     AND substring(hs, 7, 6) IN ('383961', '383761'), FALSE) AS is_gif,
         |   ${byteAt("21")} AS packed FROM m),
         | g AS (SELECT *, CASE WHEN packed >= 128
         |     THEN 3 * (1 << CAST(packed % 8 + 1 AS INT)) ELSE 0 END AS gct_len
         |   FROM p)
         |SELECT doc_id, is_gif,
         | CASE WHEN is_gif THEN CASE substring(hs, 7, 6)
         |   WHEN '383961' THEN '89a' ELSE '87a' END END AS version,
         | CASE WHEN is_gif THEN CAST(${byteAt("13")} + 256 * (${byteAt("15")}) AS BIGINT) END AS width,
         | CASE WHEN is_gif THEN CAST(${byteAt("17")} + 256 * (${byteAt("19")}) AS BIGINT) END AS height,
         | CASE WHEN is_gif THEN CAST(CASE WHEN packed >= 128
         |   THEN (1 << CAST(packed % 8 + 1 AS INT)) ELSE 0 END AS BIGINT) END AS n_colors,
         | CASE WHEN is_gif THEN CAST(1 + doc_id % 4 AS BIGINT) END AS n_frames,
         | CASE WHEN is_gif AND substring(hs, 7, 6) = '383961'
         |     AND substring(hs, CAST((13 + gct_len) * 2 + 1 AS INT), 6) = '21F904'
         |   THEN CAST(${byteAt("(13 + gct_len) * 2 + 1 + 8")} +
         |     256 * (${byteAt("(13 + gct_len) * 2 + 1 + 10")}) AS BIGINT) END AS delay_cs
         |FROM g ORDER BY doc_id""".stripMargin
    },

    "m11_pdf_meta" -> {
      def dig(e: String) = s"hex(chr(CAST(48 + $e AS INT)))"
      def entry(off: String) =
        s"hex(lpad(CAST($off AS VARCHAR), 10, '0')) || '${hexOf(" 00000 n \n")}'"
      val kidsCase = (1 to 5).map(k =>
        s"WHEN $k THEN '${hexOf((3 until 3 + k).map(i => s"$i 0 R").mkString(" "))}'")
        .mkString(" ")
      val pagesCase = (1 to 5).map(k =>
        s"WHEN $k THEN '${hexOf((3 until 3 + k)
          .map(i => s"$i 0 obj<</Type/Page/Parent 2 0 R>>endobj\n").mkString)}'")
        .mkString(" ")
      val pageEntries = (0 until 5).map(j =>
        s"CASE WHEN n > $j THEN ${entry(s"c + 6 * n + 97 + 41 * $j")} ELSE '' END")
        .mkString(" || ")
      s"""WITH m AS (SELECT doc_id, text,
         |   CAST(doc_id % 5 + 1 AS BIGINT) AS n,
         |   CAST(doc_id % 23 + 4 AS BIGINT) AS c,
         |   CAST(octet_length(encode(text)) AS BIGINT) AS L
         |  FROM documents),
         | o AS (SELECT *,
         |   c + 47 * n + 141 + length(CAST(L AS VARCHAR)) + L AS xref_off FROM m),
         | h AS (SELECT doc_id, n, L, xref_off,
         |   CASE WHEN doc_id % 17 = 0 THEN hex(encode(text)) ELSE
         |     '${hexOf("%PDF-1.")}' || ${dig("doc_id % 4 + 4")} || '0A' ||
         |     '25' || repeat('E2', CAST(c AS INT)) || '0A' ||
         |     '${hexOf("1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n")}' ||
         |     '${hexOf("2 0 obj<</Type/Pages/Kids[")}' ||
         |     CASE CAST(n AS INT) $kidsCase END ||
         |     '${hexOf("]/Count ")}' || ${dig("n")} || '${hexOf(">>endobj\n")}' ||
         |     CASE CAST(n AS INT) $pagesCase END ||
         |     ${dig("n + 3")} || '${hexOf(" 0 obj<</Length ")}' ||
         |     hex(CAST(L AS VARCHAR)) || '${hexOf(">>stream\n")}' ||
         |     hex(encode(text)) || '${hexOf("\nendstream endobj\n")}' ||
         |     '${hexOf("xref\n0 ")}' || ${dig("n + 4")} || '0A' ||
         |     '${hexOf("0000000000 65535 f \n")}' ||
         |     ${entry("c + 11")} || ${entry("c + 54")} ||
         |     $pageEntries ||
         |     ${entry("c + 47 * n + 97")} ||
         |     '${hexOf("trailer<</Size ")}' || ${dig("n + 4")} ||
         |     '${hexOf("/Root 1 0 R>>\nstartxref\n")}' ||
         |     hex(CAST(xref_off AS VARCHAR)) || '${hexOf("\n%%EOF")}'
         |   END AS hs FROM o),
         | p AS (SELECT *, substring(hs, 1, 10) = '${hexOf("%PDF-")}' AS is_pdf FROM h)
         |SELECT doc_id, is_pdf,
         |  CASE WHEN is_pdf THEN '1.' || chr(CAST(52 + doc_id % 4 AS INT)) END AS version,
         |  CASE WHEN is_pdf THEN n END AS n_pages,
         |  CASE WHEN is_pdf THEN n + 4 END AS n_objects,
         |  CASE WHEN is_pdf THEN L END AS stream_len,
         |  CASE WHEN is_pdf THEN
         |    substring(hs, CAST(xref_off * 2 + 1 AS INT), 10) = '${hexOf("xref\n")}'
         |  END AS xref_ok
         |FROM p ORDER BY doc_id""".stripMargin
    },

    "m10_exif_meta" -> {
      def byteAt(k: String) =
        s"(CAST(strpos('0123456789ABCDEF', substring(hs, CAST($k AS INT), 1)) - 1 AS BIGINT) * 16 + " +
          s"strpos('0123456789ABCDEF', substring(hs, CAST(($k) + 1 AS INT), 1)) - 1)"
      def beFold(start: String, nBytes: Int) =
        s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          s"list_transform(range(0, $nBytes), k -> ${byteAt(s"($start) + 2 * k")})), " +
          "(a, b) -> a * 256 + b)"
      def leFold(start: String, nBytes: Int) =
        s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          s"list_transform(range(0, $nBytes), k -> ${byteAt(s"($start) + 2 * (${nBytes - 1} - k)")})), " +
          "(a, b) -> a * 256 + b)"
      s"""WITH w0 AS (SELECT doc_id, text,
         |    lpad(hex(CAST(200 + doc_id % 4000 AS INT)), 8, '0') AS wbe,
         |    lpad(hex(CAST(1 + doc_id % 8 AS INT)), 4, '0') AS obe
         |   FROM documents),
         | m AS (SELECT doc_id, text IS NOT NULL AND doc_id % 17 <> 0 AS ok,
         |   CASE WHEN text IS NULL THEN ''
         |     WHEN doc_id % 17 = 0 THEN hex(encode(text)) ELSE
         |     'FFD8FFFE' || lpad(hex(CAST(((doc_id % 19) + 19) % 19 + 6 AS INT)), 4, '0') ||
         |     repeat('41', CAST(((doc_id % 19) + 19) % 19 + 4 AS INT)) ||
         |     'FFE1' || CASE WHEN doc_id % 13 = 0 THEN '001E' ELSE '002E' END ||
         |     '457869660000' ||
         |     CASE WHEN doc_id % 3 = 0 THEN '4D4D002A000000080002'
         |       ELSE '49492A00080000000200' END ||
         |     CASE WHEN doc_id % 3 = 0 THEN '0100000400000001' || wbe
         |       ELSE '0001040001000000' ||
         |         substring(wbe, 7, 2) || substring(wbe, 5, 2) ||
         |         substring(wbe, 3, 2) || substring(wbe, 1, 2) END ||
         |     CASE WHEN doc_id % 13 = 0 THEN '' ELSE
         |       CASE WHEN doc_id % 3 = 0 THEN '0112000300000001' || obe || '0000'
         |         ELSE '1201030001000000' ||
         |           substring(obe, 3, 2) || substring(obe, 1, 2) || '0000' END ||
         |       '00000000' END ||
         |     'FFD9' || hex(encode(text)) END AS hs,
         |   ((doc_id % 19) + 19) % 19 + 4 AS pad
         |  FROM w0 WHERE doc_id IS NOT NULL)
         |SELECT doc_id, ok AS has_exif,
         | CASE WHEN ok THEN
         |   CASE WHEN doc_id % 3 = 0 THEN 'MM' ELSE 'II' END END AS byte_order,
         | CASE WHEN ok THEN
         |   CAST(CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 2 END AS BIGINT) END AS n_entries,
         | CASE WHEN ok THEN
         |   CASE WHEN doc_id % 3 = 0 THEN ${beFold("(34 + pad) * 2 + 1", 4)}
         |     ELSE ${leFold("(34 + pad) * 2 + 1", 4)} END END AS width,
         | CASE WHEN ok AND doc_id % 13 <> 0 THEN
         |   CASE WHEN doc_id % 3 = 0 THEN ${beFold("(46 + pad) * 2 + 1", 2)}
         |     ELSE ${leFold("(46 + pad) * 2 + 1", 2)} END END AS orientation
         |FROM m ORDER BY doc_id""".stripMargin
    },

    "m9_mp4_meta" -> {
      def fold(start: String, n: Int) =
        s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          s"list_transform(range($start, ($start) + $n), i -> " +
          s"CAST(strpos('0123456789ABCDEF', substring(hs, CAST(i AS INT), 1)) - 1 AS BIGINT))), " +
          "(a, b) -> a * 16 + b)"
      s"""WITH m AS (SELECT doc_id,
         |   CASE WHEN doc_id % 17 = 0 THEN hex(encode(text))
         |     ELSE '0000001466747970' ||
         |       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN '69736F6D'
         |         WHEN 1 THEN '6D703432' ELSE '61766331' END ||
         |       '0000000069736F6D' ||
         |       lpad(hex(CAST(8 + doc_id % 23 AS INT)), 8, '0') || '66726565' ||
         |       repeat('00', CAST(doc_id % 23 AS INT)) ||
         |       lpad(hex(CAST(116 + (doc_id % 3 + 1) * 8 AS INT)), 8, '0') || '6D6F6F76' ||
         |       '0000006C6D766864' || '000000000000000000000000' ||
         |       lpad(hex(CAST(600 * (doc_id % 4 + 1) AS INT)), 8, '0') ||
         |       lpad(hex(CAST(6000 + doc_id % 90000 AS INT)), 8, '0') ||
         |       '000100000100' || repeat('00', 10) ||
         |       '000100000000000000000000000000000001000000000000' ||
         |       '000000000000000040000000' || repeat('00', 24) || '00000002' ||
         |       repeat('000000087472616B', CAST(doc_id % 3 + 1 AS INT)) ||
         |       CASE WHEN doc_id % 5 = 0 THEN '000000016D646174' ||
         |           lpad(hex(CAST(octet_length(encode(text)) + 16 AS BIGINT)), 16, '0')
         |         ELSE lpad(hex(CAST(octet_length(encode(text)) + 8 AS BIGINT)), 8, '0') ||
         |           '6D646174' END || hex(encode(text)) END AS hs,
         |   CAST(20 + 8 + doc_id % 23 AS BIGINT) AS mo
         |  FROM documents),
         | p AS (SELECT doc_id, hs, mo + 8 AS vh,
         |     substring(hs, 9, 8) = '66747970' AS is_mp4 FROM m)
         |SELECT doc_id, is_mp4,
         | CASE WHEN is_mp4 THEN
         |   CASE substring(hs, 17, 8) WHEN '69736F6D' THEN 'isom'
         |     WHEN '6D703432' THEN 'mp42' ELSE 'avc1' END END AS brand,
         | CASE WHEN is_mp4 THEN ${fold("(vh + 20) * 2 + 1", 8)} END AS timescale,
         | CASE WHEN is_mp4 THEN ${fold("(vh + 24) * 2 + 1", 8)} * 1000
         |   // ${fold("(vh + 20) * 2 + 1", 8)} END AS duration_ms,
         | CASE WHEN is_mp4 THEN CAST(doc_id % 3 + 1 AS BIGINT) END AS n_tracks,
         | CASE WHEN is_mp4 THEN CAST(4 AS BIGINT) END AS n_boxes
         |FROM p ORDER BY doc_id""".stripMargin
    },

    // m8's twin re-reads the PCM payload from the TEXT hex (the plant's
    // data chunk is exactly the text bytes), rebuilds the signed 16-bit
    // LE samples, and replays the per-window square-sum in BIGINT.
    "m8_audio_energy" -> {
      def byteAt(k: String) =
        s"(CAST(strpos('0123456789ABCDEF', substring(ph, CAST($k AS INT), 1)) - 1 AS BIGINT) * 16 + " +
          s"strpos('0123456789ABCDEF', substring(ph, CAST(($k) + 1 AS INT), 1)) - 1)"
      s"""WITH m AS (SELECT doc_id, hex(encode(text)) AS ph FROM documents
         |   WHERE doc_id % 17 <> 0),
         | sm AS (SELECT doc_id, list_transform(
         |     list_transform(range(0, len(ph) // 4),
         |       k -> ${byteAt("4 * k + 1")} + 256 * ${byteAt("4 * k + 3")}),
         |     v -> CASE WHEN v >= 32768 THEN v - 65536 ELSE v END) AS sv
         |   FROM m),
         | w AS (SELECT doc_id, sv, unnest(range(0, len(sv) // 64)) AS win FROM sm)
         |SELECT doc_id, CAST(win AS BIGINT) AS win,
         |  CAST(list_sum(list_transform(range(0, 64),
         |    i -> sv[CAST(win * 64 + i + 1 AS INT)] *
         |         sv[CAST(win * 64 + i + 1 AS INT)])) AS BIGINT) AS energy
         |FROM w ORDER BY doc_id, win""".stripMargin
    },

    // m7's twin rebuilds the planted container hex and re-reads the SOF
    // fields at the ARITHMETIC offsets (SOI 2 + COM 4+payload bytes),
    // so the gate checks the engine's generic marker walk lands exactly
    // where the per-row layout puts the frame header.
    "m7_jpeg_meta" -> {
      def fold(start: String, n: Int) =
        s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          s"list_transform(range($start, $start + $n), i -> " +
          s"CAST(strpos('0123456789ABCDEF', substring(hs, CAST(i AS INT), 1)) - 1 AS BIGINT))), " +
          "(a, b) -> a * 16 + b)"
      s"""WITH m AS (SELECT doc_id,
         |   CASE WHEN text IS NULL THEN ''
         |        WHEN doc_id % 17 = 0 THEN hex(encode(text))
         |        ELSE 'FFD8FFFE' || lpad(hex(CAST(((doc_id % 23) + 23) % 23 + 6 AS INT)), 4, '0') ||
         |          repeat('41', CAST(((doc_id % 23) + 23) % 23 + 4 AS INT)) || 'FFC0001108' ||
         |          lpad(hex(CAST(100 + doc_id % 1000 AS INT)), 4, '0') ||
         |          lpad(hex(CAST(100 + doc_id % 1900 AS INT)), 4, '0') ||
         |          '03011100021101031101' || hex(encode(text)) END AS hs,
         |   CAST(6 + ((doc_id % 23) + 23) % 23 + 4 AS BIGINT) AS so
         |  FROM documents WHERE doc_id IS NOT NULL),
         | p AS (SELECT doc_id, hs, so, starts_with(hs, 'FFD8') AS is_jpeg FROM m)
         |SELECT doc_id, is_jpeg,
         | CASE WHEN is_jpeg THEN ${fold("(so + 4) * 2 + 1", 2)} END AS bits,
         | CASE WHEN is_jpeg THEN ${fold("(so + 5) * 2 + 1", 4)} END AS height,
         | CASE WHEN is_jpeg THEN ${fold("(so + 7) * 2 + 1", 4)} END AS width,
         | CASE WHEN is_jpeg THEN CAST(2 AS BIGINT) END AS n_segments
         |FROM p ORDER BY doc_id""".stripMargin
    },

    // m1's twin parses the same planted container from its hex encoding
    // (same fold-the-hex-digits field extraction as m5's).
    "m1_media_meta" -> {
      def fold(start: Int, n: Int) =
        s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          s"list_transform(range($start, ${start + n}), i -> " +
          s"CAST(strpos('0123456789ABCDEF', substring(hs, CAST(i AS INT), 1)) - 1 AS BIGINT))), " +
          "(a, b) -> a * 16 + b)"
      s"""WITH m AS (SELECT doc_id,
         |   CASE WHEN text IS NULL THEN ''
         |        WHEN doc_id % 17 = 0 THEN hex(encode(text))
         |        ELSE '89504E470D0A1A0A0000000D49484452' ||
         |          lpad(hex(CAST(100 + doc_id % 1900 AS INT)), 8, '0') ||
         |          lpad(hex(CAST(100 + doc_id % 1000 AS INT)), 8, '0') ||
         |          '0806' || hex(encode(text)) END AS hs
         |  FROM documents WHERE doc_id IS NOT NULL),
         | p AS (SELECT doc_id, hs, CAST(length(hs) // 2 AS BIGINT) AS n_bytes,
         |   starts_with(hs, '89504E470D0A1A0A') AS is_png FROM m)
         |SELECT doc_id, n_bytes, is_png,
         | CASE WHEN is_png THEN ${fold(33, 8)} END AS width,
         | CASE WHEN is_png THEN ${fold(41, 8)} END AS height,
         | CASE WHEN is_png THEN ${fold(49, 2)} END AS bit_depth
         |FROM p ORDER BY doc_id""".stripMargin
    },

    "m4_format_sniff" ->
      """WITH m AS (SELECT doc_id,
        |   list_extract(['jpeg','png','gif','riff','pdf'],
        |     CAST(doc_id % 5 + 1 AS INT)) AS declared,
        |   CASE WHEN doc_id % 17 = 0 THEN hex(encode(text))
        |        ELSE list_extract(['FFD8FFE0','89504E47','47494638','52494646','25504446'],
        |               CAST(doc_id % 5 + 1 AS INT)) || hex(encode(text)) END AS h
        |  FROM documents)
        |SELECT doc_id, declared,
        | CASE WHEN starts_with(h, 'FFD8FF') THEN 'jpeg'
        |      WHEN starts_with(h, '89504E47') THEN 'png'
        |      WHEN starts_with(h, '474946') THEN 'gif'
        |      WHEN starts_with(h, '52494646') THEN 'riff'
        |      WHEN starts_with(h, '25504446') THEN 'pdf'
        |      ELSE 'unknown' END AS detected,
        | declared = (CASE WHEN starts_with(h, 'FFD8FF') THEN 'jpeg'
        |      WHEN starts_with(h, '89504E47') THEN 'png'
        |      WHEN starts_with(h, '474946') THEN 'gif'
        |      WHEN starts_with(h, '52494646') THEN 'riff'
        |      WHEN starts_with(h, '25504446') THEN 'pdf'
        |      ELSE 'unknown' END) AS signature_ok
        |FROM m ORDER BY doc_id""".stripMargin,

    // Base-16 field extraction without conv(): fold the hex digits
    // through a*16 + strpos-indexed value (hex() is uppercase in both
    // engines, so the digit lookup is exact).
    "m5_image_dims" -> {
      def fold(start: Int, n: Int) =
        s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          s"list_transform(range($start, ${start + n}), i -> " +
          s"CAST(strpos('0123456789ABCDEF', substring(hs, CAST(i AS INT), 1)) - 1 AS BIGINT))), " +
          "(a, b) -> a * 16 + b)"
      s"""WITH m AS (SELECT doc_id,
         |   CASE WHEN doc_id % 17 = 0 THEN hex(encode(text))
         |        ELSE '89504E470D0A1A0A0000000D49484452' ||
         |          lpad(hex(CAST(100 + doc_id % 1900 AS INT)), 8, '0') ||
         |          lpad(hex(CAST(100 + doc_id % 1000 AS INT)), 8, '0') ||
         |          '0806' || hex(encode(text)) END AS hs
         |  FROM documents),
         | p AS (SELECT doc_id, hs,
         |   starts_with(hs, '89504E470D0A1A0A') AS is_png FROM m)
         |SELECT doc_id, is_png,
         | CASE WHEN is_png THEN ${fold(33, 8)} END AS width,
         | CASE WHEN is_png THEN ${fold(41, 8)} END AS height,
         | CASE WHEN is_png THEN ${fold(49, 2)} END AS bit_depth
         |FROM p ORDER BY doc_id""".stripMargin
    },

    // m13: m5's header replay + the same integer fit-within arithmetic
    "m13_resize_plan" -> {
      def fold(start: Int, n: Int) =
        s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          s"list_transform(range($start, ${start + n}), i -> " +
          s"CAST(strpos('0123456789ABCDEF', substring(hs, CAST(i AS INT), 1)) - 1 AS BIGINT))), " +
          "(a, b) -> a * 16 + b)"
      s"""WITH m AS (SELECT doc_id,
         |   CASE WHEN doc_id % 17 = 0 THEN hex(encode(text))
         |        ELSE '89504E470D0A1A0A0000000D49484452' ||
         |          lpad(hex(CAST(100 + doc_id % 1900 AS INT)), 8, '0') ||
         |          lpad(hex(CAST(100 + doc_id % 1000 AS INT)), 8, '0') ||
         |          '0806' || hex(encode(text)) END AS hs
         |  FROM documents),
         | p AS (SELECT doc_id, hs,
         |   starts_with(hs, '89504E470D0A1A0A') AS is_png FROM m),
         | d AS (SELECT doc_id, is_png,
         |   CASE WHEN is_png THEN ${fold(33, 8)} END AS width,
         |   CASE WHEN is_png THEN ${fold(41, 8)} END AS height FROM p),
         | r AS (SELECT *,
         |   CASE WHEN is_png THEN greatest(width, height) > 224 END AS needs_resize
         |   FROM d),
         | o AS (SELECT *,
         |   CASE WHEN needs_resize THEN width * 224 // greatest(width, height)
         |        ELSE width END AS out_w,
         |   CASE WHEN needs_resize THEN height * 224 // greatest(width, height)
         |        ELSE height END AS out_h FROM r)
         |SELECT doc_id, is_png, width, height, needs_resize, out_w, out_h,
         | out_w * out_h * 3 AS out_bytes
         |FROM o ORDER BY doc_id""".stripMargin
    },

    // WAV twin: plants the same 44-byte LE header from doc_id and
    // parses it back with the per-byte strpos-fold (hex() of a BIGINT
    // is uppercase-no-leading-zeros in both engines, so the planted
    // strings are identical).
    "m6_wav_meta" -> {
      def byteAt(o: Int) = // byte o (0-based) of hs, via 2-hex-digit fold
        s"(CAST(strpos('0123456789ABCDEF', substring(hs, ${o * 2 + 1}, 1)) - 1 AS BIGINT) * 16 + " +
          s"CAST(strpos('0123456789ABCDEF', substring(hs, ${o * 2 + 2}, 1)) - 1 AS BIGINT))"
      def rle16(o: Int) = s"(${byteAt(o)} + ${byteAt(o + 1)} * 256)"
      def rle32(o: Int) = s"(${byteAt(o)} + ${byteAt(o + 1)} * 256 + " +
        s"${byteAt(o + 2)} * 65536 + ${byteAt(o + 3)} * 16777216)"
      def le16(v: String) = s"lpad(hex(($v) % 256), 2, '0') || lpad(hex(($v) // 256 % 256), 2, '0')"
      def le32(v: String) = s"lpad(hex(($v) % 256), 2, '0') || lpad(hex(($v) // 256 % 256), 2, '0') || " +
        s"lpad(hex(($v) // 65536 % 256), 2, '0') || lpad(hex(($v) // 16777216 % 256), 2, '0')"
      s"""WITH d AS (SELECT doc_id, octet_length(encode(text)) AS dsz,
         |   1 + doc_id % 2 AS ch, 8000 * (1 + doc_id % 5) AS rate,
         |   hex(encode(text)) AS payload FROM documents),
         | le AS (SELECT doc_id, payload, dsz, ch, rate,
         |   2 * ch AS ba, rate * 2 * ch AS br FROM d),
         | m AS (SELECT doc_id,
         |   CASE WHEN doc_id % 17 = 0 THEN payload
         |     ELSE '52494646' || ${le32("dsz + 36")} ||
         |       '57415645' || '666D7420' || '10000000' || '0100' ||
         |       ${le16("ch")} || ${le32("rate")} || ${le32("br")} ||
         |       ${le16("ba")} || ${le16("16")} || '64617461' || ${le32("dsz")} || payload
         |   END AS hs FROM le),
         | p AS (SELECT doc_id, hs,
         |   starts_with(hs, '52494646') AND substring(hs, 17, 8) = '57415645' AS is_wav
         |   FROM m)
         |SELECT doc_id, is_wav,
         | CASE WHEN is_wav THEN ${rle16(22)} END AS channels,
         | CASE WHEN is_wav THEN ${rle32(24)} END AS sample_rate,
         | CASE WHEN is_wav THEN ${rle16(34)} END AS bits,
         | CASE WHEN is_wav THEN (${rle32(40)} // ${rle16(32)}) * 1000 // ${rle32(24)} END
         |   AS duration_ms
         |FROM p ORDER BY doc_id""".stripMargin
    },

    "m2_media_bytes" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        | octet_length(encode(text)) - length(text) AS multibyte_overhead
        |FROM documents ORDER BY doc_id""".stripMargin,

    "m3_frame_sample" ->
      """WITH m AS (SELECT doc_id, hex(encode(text)) AS media_hex,
        |    greatest(CAST(floor((octet_length(encode(text)) - 32) / 100) AS BIGINT) + 1, 0)
        |      AS n_frames
        |  FROM documents),
        | f AS (SELECT doc_id, unnest(range(0, n_frames)) AS frame_no, media_hex
        |   FROM m WHERE n_frames > 0)
        |SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
        | md5(substring(media_hex, CAST(frame_no * 200 + 1 AS INT), 64)) AS frame_md5
        |FROM f ORDER BY doc_id, frame_no""".stripMargin
  )
}
