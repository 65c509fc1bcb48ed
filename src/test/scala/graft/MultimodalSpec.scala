package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the JPEG marker walk (m7) beyond the fixture's
  * planted layout: standalone markers, multi-segment hops, SOS/EOI
  * stops, truncation, and the SOF variants — the branches a generic
  * walk must get right that the hash gate's single layout can't reach. */
class MultimodalSpec extends AnyFunSuite {

  private def jpeg(segments: Array[Int]*): Array[Byte] =
    (Array(0xFF, 0xD8) ++ segments.flatten).map(_.toByte).toArray

  private def sof(marker: Int, bits: Int, h: Int, w: Int): Array[Int] =
    Array(0xFF, marker, 0x00, 0x0B, bits, h >> 8, h & 0xFF, w >> 8, w & 0xFF, 0x01, 0x11)

  private def com(n: Int): Array[Int] =
    Array(0xFF, 0xFE, (n + 2) >> 8, (n + 2) & 0xFF) ++ Array.fill(n)(0x41)

  test("walks multiple variable-length segments to a SOF2 progressive header") {
    val m = MultimodalQueries.decodeJpeg(1L, jpeg(com(5), com(300), sof(0xC2, 8, 480, 640)))
    assert(m.is_jpeg && m.bits.contains(8L))
    assert(m.height.contains(480L) && m.width.contains(640L))
    assert(m.n_segments.contains(3L))
  }

  test("standalone markers (TEM, RSTn) advance without a length field") {
    val m = MultimodalQueries.decodeJpeg(2L,
      jpeg(Array(0xFF, 0x01), Array(0xFF, 0xD3), sof(0xC0, 12, 1, 65535)))
    assert(m.bits.contains(12L) && m.height.contains(1L) && m.width.contains(65535L))
  }

  test("DHT is hopped as a plain segment, not mistaken for a frame header") {
    // 0xC4 sits inside the SOF code range but is the Huffman-table marker
    val dht = Array(0xFF, 0xC4, 0x00, 0x05, 0x00, 0x01, 0x02)
    val m = MultimodalQueries.decodeJpeg(3L, jpeg(dht, sof(0xC1, 8, 7, 9)))
    assert(m.bits.contains(8L) && m.height.contains(7L) && m.width.contains(9L))
    assert(m.n_segments.contains(2L))
  }

  test("SOS before any SOF stops the walk with null dims") {
    val m = MultimodalQueries.decodeJpeg(4L, jpeg(com(3), Array(0xFF, 0xDA)))
    assert(m.is_jpeg && m.bits.isEmpty && m.n_segments.contains(1L))
  }

  private def riff(chunks: Array[Byte]*): Array[Byte] = {
    val body = "WAVE".getBytes ++ chunks.flatten
    "RIFF".getBytes ++ Array[Byte](
      (body.length & 0xFF).toByte, ((body.length >> 8) & 0xFF).toByte, 0, 0) ++ body
  }

  private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val n = payload.length
    id.getBytes ++ Array[Byte]((n & 0xFF).toByte, ((n >> 8) & 0xFF).toByte, 0, 0) ++
      payload ++ (if (n % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
  }

  test("wavEnergy walks odd-sized chunks (word-aligned) to a displaced data chunk") {
    // a 3-byte LIST chunk forces the word-alignment hop; data is NOT at
    // byte 44, so a fixed-offset reader would misparse
    val samples = Array.tabulate(130)(i => (i - 65) * 3) // 130 samples → 2 windows of 64
    val pcm = samples.flatMap(v => Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte))
    val bytes = riff(chunk("LIST", Array[Byte](1, 2, 3)), chunk("fmt ", new Array[Byte](16)),
      chunk("data", pcm))
    val rows = MultimodalQueries.wavEnergy(9L, bytes, 64)
    assert(rows.map(_._2) === Seq(0L, 1L))
    val expected = (0 until 2).map(w =>
      (0 until 64).map(k => { val v = samples(w * 64 + k).toLong; v * v }).sum)
    assert(rows.map(_._3) === expected)
  }

  test("wavEnergy: negative samples, truncated data chunk, and non-WAV bytes") {
    val neg = Array.fill(64)(-32768)
    val pcm = neg.flatMap(v => Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte))
    val full = MultimodalQueries.wavEnergy(1L, riff(chunk("data", pcm)), 64)
    assert(full.map(_._3) === Seq(64L * 32768L * 32768L))
    // declared size larger than the bytes present → clamp, partial window dropped
    val lying = riff(chunk("data", pcm)).dropRight(4)
    assert(MultimodalQueries.wavEnergy(2L, lying, 64).isEmpty)
    assert(MultimodalQueries.wavEnergy(3L, "not audio at all".getBytes, 64).isEmpty)
  }

  test("property: random JPEG segment layouts parse to the planted SOF fields") {
    import org.scalacheck.{Gen, Prop}
    val segGen: Gen[Array[Int]] = Gen.oneOf(
      Gen.chooseNum(0, 400).map(com),
      Gen.const(Array(0xFF, 0x01)),            // TEM standalone
      Gen.chooseNum(0xD0, 0xD7).map(m => Array(0xFF, m)), // RSTn standalone
      Gen.chooseNum(0, 60).map(n =>            // APPn with payload
        Array(0xFF, 0xE1, (n + 2) >> 8, (n + 2) & 0xFF) ++ Array.fill(n)(0x55)),
      Gen.chooseNum(0, 30).map(n =>            // DHT — in-range-but-not-SOF marker
        Array(0xFF, 0xC4, (n + 2) >> 8, (n + 2) & 0xFF) ++ Array.fill(n)(0x33))
    )
    val sofMarker = Gen.oneOf(Seq(0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF))
    graft.PropCheck.check(Prop.forAll(
      Gen.listOfN(4, segGen).flatMap(segs => Gen.listOf(Gen.oneOf(segs)).map(_.take(6))),
      sofMarker, Gen.chooseNum(1, 65535), Gen.chooseNum(1, 65535),
      Gen.chooseNum(1, 16)) { (segs, m, h, w, bits) =>
      val bytes = jpeg(segs :+ sof(m, bits, h, w): _*)
      val r = MultimodalQueries.decodeJpeg(0L, bytes)
      r.is_jpeg && r.bits.contains(bits.toLong) &&
        r.height.contains(h.toLong) && r.width.contains(w.toLong) &&
        r.n_segments.contains((segs.count(s => s.length > 2) + 1).toLong)
    }, minSuccessful = 200)
  }

  test("property: wavEnergy over random chunk layouts equals the naive reference") {
    import org.scalacheck.{Gen, Prop}
    val preGen: Gen[Array[Byte]] = Gen.oneOf(
      Gen.chooseNum(0, 9).map(n => chunk("LIST", Array.fill(n)(7: Byte))),
      Gen.const(chunk("fmt ", new Array[Byte](16))),
      Gen.chooseNum(1, 5).map(n => chunk("junk", Array.fill(n)(1: Byte))))
    val pcmGen = Gen.listOf(Gen.chooseNum(-32768, 32767)).map(_.take(300))
    graft.PropCheck.check(Prop.forAll(Gen.listOfN(3, preGen).map(_.take(2)), pcmGen) {
      (pre, samples) =>
        val pcm = samples.toArray.flatMap(v =>
          Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte))
        val bytes = riff(pre :+ chunk("data", pcm): _*)
        val got = MultimodalQueries.wavEnergy(0L, bytes, 64)
        val want = samples.grouped(64).filter(_.length == 64).zipWithIndex.map {
          case (wn, i) => (0L, i.toLong, wn.map(v => v.toLong * v).sum)
        }.toSeq
        got == want
    }, minSuccessful = 200)
  }

  test("missing SOI and truncated SOF are corrupt, not crashes") {
    val noSoi = MultimodalQueries.decodeJpeg(5L, Array[Byte](0x00, 0x01, 0x02, 0x03))
    assert(!noSoi.is_jpeg && noSoi.width.isEmpty)
    // SOF marker present but the frame fields run past the buffer
    val truncated = MultimodalQueries.decodeJpeg(6L,
      (Array(0xFF, 0xD8, 0xFF, 0xC0, 0x00, 0x0B, 0x08).map(_.toByte)).toArray)
    assert(truncated.is_jpeg && truncated.width.isEmpty)
    val empty = MultimodalQueries.decodeJpeg(7L, Array.emptyByteArray)
    assert(!empty.is_jpeg)
  }

  // ---- m9: ISO-BMFF box walk, branches beyond the gated layout ----

  private def be32(v: Long): Array[Int] =
    Array((v >> 24).toInt & 0xFF, (v >> 16).toInt & 0xFF, (v >> 8).toInt & 0xFF, v.toInt & 0xFF)
  private def be64(v: Long): Array[Int] = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
  private def cc(t: String): Array[Int] = t.getBytes("US-ASCII").map(_.toInt & 0xFF)
  private def box(t: String, payload: Array[Int]*): Array[Int] = {
    val p = payload.flatten.toArray
    be32(8L + p.length) ++ cc(t) ++ p
  }
  private def bytes(xs: Array[Int]*): Array[Byte] = xs.flatten.map(_.toByte).toArray
  private val ftyp = box("ftyp", cc("isom"), be32(0), cc("isom"))
  private def mvhd0(ts: Long, dur: Long): Array[Int] =
    box("mvhd", Array(0, 0, 0, 0), be32(0), be32(0), be32(ts), be32(dur),
      Array.fill(80)(0))

  test("mp4: moov displaced by arbitrary unknown boxes still parses") {
    val m = MultimodalQueries.decodeMp4(1L, bytes(ftyp,
      box("skip", Array.fill(37)(0)), box("uuid", Array.fill(3)(0)),
      box("moov", mvhd0(1000, 5500), box("trak"), box("trak"), box("trak"))))
    assert(m.is_mp4 && m.brand.contains("isom"))
    assert(m.timescale.contains(1000L) && m.duration_ms.contains(5500L))
    assert(m.n_tracks.contains(3L) && m.n_boxes.contains(4L))
  }

  test("mp4: 64-bit largesize mdat is hopped, not misparsed") {
    val payload = Array.fill(40)(0x55)
    val largeMdat = be32(1) ++ cc("mdat") ++ be64(16L + payload.length) ++ payload
    val m = MultimodalQueries.decodeMp4(2L, bytes(ftyp, largeMdat,
      box("moov", mvhd0(600, 600), box("trak"))))
    assert(m.timescale.contains(600L) && m.duration_ms.contains(1000L))
    assert(m.n_boxes.contains(3L), s"largesize hop derailed: $m")
  }

  test("mp4: version-1 mvhd reads the 64-bit duration layout") {
    val mvhd1 = box("mvhd", Array(1, 0, 0, 0), be64(0), be64(0),
      be32(48000), be64(96000L), Array.fill(80)(0))
    val m = MultimodalQueries.decodeMp4(3L, bytes(ftyp, box("moov", mvhd1)))
    assert(m.timescale.contains(48000L) && m.duration_ms.contains(2000L))
  }

  test("mp4: size-0 box runs to EOF") {
    val m = MultimodalQueries.decodeMp4(4L, bytes(ftyp,
      box("moov", mvhd0(1000, 1000)),
      be32(0) ++ cc("mdat") ++ Array.fill(99)(0x77)))
    assert(m.n_boxes.contains(3L) && m.duration_ms.contains(1000L))
  }

  test("mp4: truncated and corrupt containers degrade, never crash") {
    // top-level box claims more bytes than exist: stop with what parsed
    val truncated = MultimodalQueries.decodeMp4(5L, bytes(ftyp,
      be32(4096) ++ cc("moov") ++ Array.fill(10)(0)))
    assert(truncated.is_mp4 && truncated.n_boxes.contains(1L)
      && truncated.timescale.isEmpty)
    // child box overruns moov: child walk stops, top walk continues
    val badChild = MultimodalQueries.decodeMp4(6L, bytes(ftyp,
      box("moov", be32(4096) ++ cc("mvhd")), box("free")))
    assert(badChild.n_boxes.contains(3L) && badChild.timescale.isEmpty)
    // undersized box (size < 8) cannot advance: stop
    val undersized = MultimodalQueries.decodeMp4(7L, bytes(ftyp,
      be32(3) ++ cc("junk") ++ Array.fill(20)(0)))
    assert(undersized.n_boxes.contains(1L))
    // zero-timescale mvhd must not divide by zero
    val zeroTs = MultimodalQueries.decodeMp4(8L, bytes(ftyp,
      box("moov", mvhd0(0, 500))))
    assert(zeroTs.timescale.isEmpty && zeroTs.duration_ms.isEmpty)
    assert(!MultimodalQueries.decodeMp4(9L, Array.emptyByteArray).is_mp4)
    assert(!MultimodalQueries.decodeMp4(10L, null).is_mp4)
    assert(!MultimodalQueries.decodeMp4(11L,
      "not a container at all, just text".getBytes("UTF-8")).is_mp4)
  }

  // --- m10: EXIF/TIFF IFD walk, beyond the fixture's planted layout ---

  private def exifApp1(tiff: Array[Int], lenOverride: Int = -1): Array[Byte] = {
    val seg = Array(0x45, 0x78, 0x69, 0x66, 0, 0) ++ tiff
    val len = if (lenOverride > 0) lenOverride else seg.length + 2
    (Array(0xFF, 0xD8, 0xFF, 0xE1, len >> 8, len & 0xFF) ++ seg ++
      Array(0xFF, 0xD9)).map(_.toByte)
  }

  test("exif: MM IFD displaced from the TIFF origin parses at the t-relative offset") {
    val tiff = Array(0x4D, 0x4D, 0x00, 0x2A, 0, 0, 0, 12, 0xEE, 0xEE, 0xEE, 0xEE,
      0x00, 0x01,
      0x01, 0x00, 0x00, 0x04, 0, 0, 0, 1, 0, 0, 2, 128, // ImageWidth LONG 640
      0, 0, 0, 0)
    val m = MultimodalQueries.decodeExif(1L, exifApp1(tiff))
    assert(m.has_exif && m.byte_order.contains("MM") && m.n_entries.contains(1L))
    assert(m.width.contains(640L) && m.orientation.isEmpty, s"displaced IFD misparsed: $m")
  }

  test("exif: II entries parse in any order; SHORT reads 2 bytes, LONG reads 4") {
    val tiff = Array(0x49, 0x49, 0x2A, 0x00, 8, 0, 0, 0,
      0x02, 0x00,
      0x12, 0x01, 0x03, 0x00, 1, 0, 0, 0, 6, 0, 0, 0,          // Orientation SHORT 6
      0x00, 0x01, 0x04, 0x00, 1, 0, 0, 0, 0x20, 0x03, 0, 0,    // ImageWidth LONG 800
      0, 0, 0, 0)
    val m = MultimodalQueries.decodeExif(2L, exifApp1(tiff))
    assert(m.byte_order.contains("II") && m.n_entries.contains(2L))
    assert(m.width.contains(800L) && m.orientation.contains(6L), s"II misparsed: $m")
  }

  test("exif: IFD declaring more entries than the segment holds parses what fits") {
    val tiff = Array(0x49, 0x49, 0x2A, 0x00, 8, 0, 0, 0,
      0x03, 0x00, // declares 3 entries; only one is present
      0x00, 0x01, 0x04, 0x00, 1, 0, 0, 0, 0x40, 0, 0, 0)
    val m = MultimodalQueries.decodeExif(3L, exifApp1(tiff))
    assert(m.n_entries.contains(1L) && m.width.contains(64L) && m.orientation.isEmpty,
      s"truncated IFD must parse what fits: $m")
  }

  test("exif: bad byte-order mark or magic degrades to has_exif with null fields") {
    val m1 = MultimodalQueries.decodeExif(4L,
      exifApp1(Array(0x5A, 0x5A, 0x2A, 0x00, 8, 0, 0, 0)))
    assert(m1.has_exif && m1.byte_order.isEmpty && m1.n_entries.isEmpty)
    val m2 = MultimodalQueries.decodeExif(5L,
      exifApp1(Array(0x49, 0x49, 0x2B, 0x00, 8, 0, 0, 0)))
    assert(m2.has_exif && m2.byte_order.isEmpty)
  }

  test("exif: non-Exif APP1 (XMP) is skipped; absence and garbage report has_exif false") {
    val xmp = "http://ns.adobe.com/".getBytes("US-ASCII").map(_ & 0xFF)
    val seg = Array(0xFF, 0xE1, 0, xmp.length + 2) ++ xmp
    val b = (Array(0xFF, 0xD8) ++ seg ++ Array(0xFF, 0xD9)).map(_.toByte)
    assert(!MultimodalQueries.decodeExif(6L, b).has_exif)
    assert(!MultimodalQueries.decodeExif(7L, null).has_exif)
    assert(!MultimodalQueries.decodeExif(8L, "plain text".getBytes("UTF-8")).has_exif)
  }

  // ---- m11: PDF structural walk, branches beyond the gated layout ----

  private def pdf(parts: String*): Array[Byte] =
    parts.mkString.getBytes("ISO-8859-1")

  private val pdfBody =
    "1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n" +
      "2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj\n" +
      "3 0 obj<</Type/Page/Parent 2 0 R>>endobj\n" +
      "4 0 obj<</Length 5>>stream\nhello\nendstream endobj\n"

  test("pdf: startxref is followed to the table; a stale pointer flips xref_ok only") {
    val header = "%PDF-1.6\n"
    val xref = "xref\n0 5\n" + "0000000000 65535 f \n" * 5
    val off = (header + pdfBody).length
    val good = pdf(header, pdfBody, xref,
      s"trailer<</Size 5/Root 1 0 R>>\nstartxref\n$off\n%%EOF")
    val m = MultimodalQueries.decodePdf(1L, good)
    assert(m.is_pdf && m.version.contains("1.6") && m.xref_ok.contains(true))
    assert(m.n_pages.contains(1L) && m.n_objects.contains(5L) && m.stream_len.contains(5L))
    // same bytes, pointer off by one: structure still reports, integrity bit drops
    val stale = pdf(header, pdfBody, xref,
      s"trailer<</Size 5/Root 1 0 R>>\nstartxref\n${off + 1}\n%%EOF")
    val s = MultimodalQueries.decodePdf(2L, stale)
    assert(s.is_pdf && s.xref_ok.contains(false) && s.n_objects.isEmpty)
    assert(s.n_pages.contains(1L) && s.stream_len.contains(5L),
      s"a bad xref pointer must not take down the object walk: $s")
  }

  test("pdf: truncation before the trailer degrades to xref_ok false, not a crash") {
    val t = MultimodalQueries.decodePdf(3L, pdf("%PDF-1.4\n", pdfBody))
    assert(t.is_pdf && t.version.contains("1.4") && t.xref_ok.contains(false))
    assert(t.n_pages.contains(1L) && t.stream_len.contains(5L))
    // truncated mid-header: too short to carry a version
    assert(!MultimodalQueries.decodePdf(4L, "%PDF".getBytes("US-ASCII")).is_pdf)
  }

  test("pdf: a payload containing 'startxref' must not shadow the real trailer") {
    val header = "%PDF-1.5\n"
    val trap = "5 0 obj<</Length 21>>stream\nstartxref\n999999999\n\nendstream endobj\n"
    val body = pdfBody + trap
    val xref = "xref\n0 6\n" + "0000000000 65535 f \n" * 6
    val off = (header + body).length
    val m = MultimodalQueries.decodePdf(5L, pdf(header, body, xref,
      s"trailer<</Size 6/Root 1 0 R>>\nstartxref\n$off\n%%EOF"))
    assert(m.xref_ok.contains(true) && m.n_objects.contains(6L),
      s"the LAST startxref (the spec's rule) must win: $m")
  }

  test("pdf: garbage, null, and headerless bytes report is_pdf false") {
    assert(!MultimodalQueries.decodePdf(6L, null).is_pdf)
    assert(!MultimodalQueries.decodePdf(7L, Array.emptyByteArray).is_pdf)
    assert(!MultimodalQueries.decodePdf(8L, "plain text body".getBytes("UTF-8")).is_pdf)
  }

  private def gif(hex: String): Array[Byte] =
    hex.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // 89a header, 3x2, GCT 2 colors (bits 0 -> 6 bytes), then blocks
  private val gifHead = "474946 383961 0300 0200 80 00 00 " + "00" * 6
  private val gce = "21F904 00 2A00 00 00" // delay 42
  private val img = "2C 0000 0000 0300 0200 00 02 02 ABCD 00" // one 2-byte sub-block

  test("gif: GCT shift, frame count, first-GCE delay, trailer stop") {
    val m = MultimodalQueries.decodeGif(1L, gif(gifHead + gce + img + img + "3B"))
    assert(m.is_gif && m.version === Some("89a"))
    assert(m.width === Some(3L) && m.height === Some(2L))
    assert(m.n_colors === Some(2L))
    assert(m.n_frames === Some(2L))
    assert(m.delay_cs === Some(42L))
  }

  test("gif: 87a carries no GCE; local color table is skipped") {
    // LCT flag on the descriptor (2 colors -> 6 bytes before LZW byte)
    val imgLct = "2C 0000 0000 0300 0200 80 " + "00" * 6 + " 02 01 AB 00"
    val m = MultimodalQueries.decodeGif(2L,
      gif("474946 383761 0300 0200 00 00 00" + imgLct + "3B"))
    assert(m.is_gif && m.version === Some("87a"))
    assert(m.n_colors === Some(0L) && m.n_frames === Some(1L))
    assert(m.delay_cs === None)
  }

  test("gif: truncation and unknown blocks degrade to frames seen so far") {
    // second image descriptor cut mid-sub-block: first frame still counts
    val cut = gifHead + gce + img + "2C 0000 0000 0300 0200 00 02 05 AB"
    val t = MultimodalQueries.decodeGif(3L, gif(cut))
    assert(t.is_gif && t.n_frames === Some(2L) && t.delay_cs === Some(42L))
    // unknown block byte stops the walk without dying
    val u = MultimodalQueries.decodeGif(4L, gif(gifHead + img + "7F" + img))
    assert(u.is_gif && u.n_frames === Some(1L))
  }

  test("gif: garbage, null, and unknown-version bytes report is_gif false") {
    assert(!MultimodalQueries.decodeGif(5L, null).is_gif)
    assert(!MultimodalQueries.decodeGif(6L, Array.emptyByteArray).is_gif)
    assert(!MultimodalQueries.decodeGif(7L, "plain text body".getBytes("UTF-8")).is_gif)
    assert(!MultimodalQueries.decodeGif(8L,
      gif("474946 383861 0300 0200 00 00 00 3B")).is_gif) // "88a"
  }

  test("m13 resize plan: downscale-only fit-within-224, aspect held, corrupt rows null") {
    val spark = graft.SparkTestBase.spark
    val rows = graft.SparkEntry.queries("m13_resize_plan")(
        spark, graft.SparkTestBase.sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      if (!r.getBoolean(1)) { // corrupt branch: the whole plan is null
        assert((2 to 7).forall(r.isNullAt), s"corrupt doc $id must plan null")
      } else {
        val (w, h) = (r.getLong(2), r.getLong(3))
        val (ow, oh) = (r.getLong(5), r.getLong(6))
        if (r.getBoolean(4)) { // needs_resize
          assert(math.max(w, h) > 224 && math.max(ow, oh) === 224,
            s"doc $id: the long edge must land exactly on 224")
          assert(ow === w * 224 / math.max(w, h) && oh === h * 224 / math.max(w, h),
            s"doc $id: aspect-preserving floor scale violated")
          assert(ow >= 1 && oh >= 1)
        } else { // pass-through: never upscale
          assert(w <= 224 && h <= 224 && ow === w && oh === h,
            s"doc $id: small images must pass through unchanged")
        }
        assert(r.getLong(7) === ow * oh * 3)
      }
    }
    // both branches exercised on the fixture
    assert(rows.exists(r => r.getBoolean(1) && r.getBoolean(4)))
    assert(rows.exists(r => r.getBoolean(1) && !r.getBoolean(4)))
    assert(rows.exists(r => !r.getBoolean(1)))
    graft.queries.Caches.release(spark, graft.SparkTestBase.sfDir)
  }
}
