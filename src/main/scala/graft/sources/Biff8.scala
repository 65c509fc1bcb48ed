package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Minimal legacy `.xls` reader: BIFF8 records inside an OLE2/CFB
  * compound container, parsed with the JDK only — the front half of the
  * reference's directory scan accepts both `*.xlsx` and `*.xls`
  * (`excel_loader/loader.py:489-551`, pandas dispatches on extension),
  * so the engine's [[Xlsx.read]] seam dispatches here on the CFB magic.
  *
  * Scope (deliberately minimal, like [[Xlsx]]'s reader): the FIRST
  * worksheet, cell record types a price list actually contains —
  * LABELSST/LABEL strings (incl. UTF-16 and SST CONTINUE spill),
  * NUMBER doubles, RK/MULRK packed numbers, BOOLERR — surfaced as the
  * same all-string grid the xlsx path produces. Formulas surface their
  * cached numeric value; charts/macros/protection are ignored.
  * Containers: regular-FAT streams, the mini-stream path (workbook
  * < 4096 bytes), DIFAT-chained FATs (files over ~7 MB, whose FAT
  * sector list overflows the 109 header slots), and both sector sizes
  * ([MS-CFB] major version 3 at 512 bytes and version 4 at 4096).
  *
  * Layout constants follow the public [MS-CFB] and [MS-XLS] format
  * documents.
  */
object Biff8 {

  private val CfbMagic =
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)

  /** True iff the first 8 bytes are the OLE2 compound-file signature. */
  def isCfb(head: Array[Byte]): Boolean =
    head.length >= 8 && java.util.Arrays.equals(head.take(8), CfbMagic)

  // ------------------------------------------------------------ LE readers

  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xFF
  private def u16(b: Array[Byte], o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def f64(b: Array[Byte], o: Int): Double = {
    var bits = 0L
    var i = 7
    while (i >= 0) { bits = (bits << 8) | (b(o + i) & 0xFFL); i -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  private val EndOfChain = -2 // 0xFFFFFFFE
  private val FreeSect = -1 // 0xFFFFFFFF

  // -------------------------------------------------------- CFB container

  /** Extract the workbook stream ("Workbook"/"Book" directory entry)
    * from a CFB file. */
  private[sources] def workbookStream(bytes: Array[Byte]): Array[Byte] = {
    require(isCfb(bytes), "not an OLE2 compound file")
    val sectorSize = 1 << u16(bytes, 30)
    require(sectorSize == 512 || sectorSize == 4096,
      s"unsupported CFB sector size $sectorSize (major version ${u16(bytes, 26)})")
    val miniSectorSize = 1 << u16(bytes, 32)
    val numFatSectors = i32(bytes, 44)
    val firstDirSector = i32(bytes, 48)
    val miniCutoff = i32(bytes, 56)
    val firstMiniFat = i32(bytes, 60)

    def sector(sid: Int): Array[Byte] = {
      // Sector 0 starts AFTER the 512-byte header rounded up to one
      // sector — i.e. at offset sectorSize, so (sid + 1) * sectorSize
      // per [MS-CFB] §2.1 (for v4's 4096-byte sectors the header pads
      // out to the full first sector; 512 + sid * 4096 would be wrong).
      val off = (sid + 1).toLong * sectorSize
      require(off >= sectorSize && off < bytes.length,
        s"corrupt CFB: sector $sid out of file")
      java.util.Arrays.copyOfRange(bytes, off.toInt,
        math.min(off.toInt + sectorSize, bytes.length))
    }
    // FAT sector list: 109 header slots, then the DIFAT sector chain
    // (each DIFAT sector holds sectorSize/4 - 1 FAT sids + a next
    // pointer in its last 4 bytes).
    val headerDifat = (0 until 109).map(i => i32(bytes, 76 + 4 * i))
    val numDifat = i32(bytes, 72)
    val chainedDifat = scala.collection.mutable.ArrayBuffer.empty[Int]
    var dsid = i32(bytes, 68)
    var dguard = 0
    while (dsid != EndOfChain && dsid != FreeSect) {
      dguard += 1
      require(dguard <= numDifat, s"cyclic/overlong DIFAT chain at sector $dsid")
      val s = sector(dsid)
      chainedDifat ++= (0 until sectorSize / 4 - 1).map(i => i32(s, i * 4))
      dsid = i32(s, sectorSize - 4)
    }
    val difat = (headerDifat ++ chainedDifat).filter(_ >= 0)
    require(difat.length == numFatSectors, s"FAT sector count mismatch: $numFatSectors")
    val fat: Array[Int] = difat.toArray.flatMap { sid =>
      val s = sector(sid); (0 until s.length / 4).map(i => i32(s, i * 4))
    }
    def chain(start: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var sid = start
      var guard = 0
      while (sid != EndOfChain && sid != FreeSect && guard <= fat.length) {
        require(sid >= 0 && sid < fat.length, s"corrupt CFB: FAT id $sid out of range")
        out.write(sector(sid)); sid = fat(sid); guard += 1
      }
      require(guard <= fat.length, "cyclic FAT chain")
      out.toByteArray
    }

    val dir = chain(firstDirSector)
    case class Entry(name: String, objType: Int, start: Int, size: Long)
    val entries = (0 until dir.length / 128).map { i =>
      val o = i * 128
      val nameLen = u16(dir, o + 64)
      val name = if (nameLen >= 2)
        new String(dir, o, nameLen - 2, StandardCharsets.UTF_16LE) else ""
      Entry(name, u8(dir, o + 66), i32(dir, o + 116),
        i32(dir, o + 120).toLong & 0xFFFFFFFFL)
    }
    val root = entries.find(_.objType == 5)
      .getOrElse(throw new IllegalArgumentException("no CFB root entry"))
    val wb = entries.find(e => e.objType == 2 && (e.name == "Workbook" || e.name == "Book"))
      .getOrElse(throw new IllegalArgumentException(
        "no Workbook stream — not an Excel .xls file"))

    if (wb.size >= miniCutoff) chain(wb.start).take(wb.size.toInt)
    else {
      // mini-stream: the root entry's regular chain holds the container;
      // the miniFAT (its own regular chain) links 64-byte mini sectors
      val container = chain(root.start)
      val miniFatBytes = chain(firstMiniFat)
      val miniFat = (0 until miniFatBytes.length / 4).map(i => i32(miniFatBytes, i * 4))
      val out = new java.io.ByteArrayOutputStream()
      var sid = wb.start
      var guard = 0
      while (sid != EndOfChain && sid != FreeSect && guard <= miniFat.length) {
        require(sid >= 0 && sid < miniFat.length &&
          (sid + 1) * miniSectorSize <= container.length,
          s"corrupt CFB: mini sector $sid out of range")
        out.write(container, sid * miniSectorSize, miniSectorSize)
        sid = miniFat(sid); guard += 1
      }
      require(guard <= miniFat.length, "cyclic miniFAT chain")
      out.toByteArray.take(wb.size.toInt)
    }
  }

  // -------------------------------------------------------- BIFF8 records

  private val RecBof = 0x0809
  private val RecEof = 0x000A
  private val RecBoundSheet = 0x0085
  private val RecSst = 0x00FC
  private val RecContinue = 0x003C
  private val RecLabelSst = 0x00FD
  private val RecLabel = 0x0204
  private val RecNumber = 0x0203
  private val RecRk = 0x027E
  private val RecMulRk = 0x00BD
  private val RecBoolErr = 0x0205
  private val RecFormula = 0x0006

  /** RK-packed number: bit0 = ÷100, bit1 = integer-in-top-30-bits,
    * else the top 30 bits are the high bits of an IEEE double. */
  private def rkValue(rk: Int): Double = {
    val base =
      if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) base / 100.0 else base
  }

  /** Numbers print the way the xlsx XML stores them: integral values
    * without a trailing ".0" (pandas' astype(str) artifact is applied
    * downstream by the canonicalize stage, same as the xlsx path). */
  private def fmtNum(d: Double): String =
    if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString

  /** Cursor over the SST record's payload plus its CONTINUE spills.
    * BIFF8 strings may break at any piece boundary; each continuation
    * piece restates the 1-byte grbit for ITS character encoding. */
  private final class SstCursor(stream: Array[Byte], pieces: Seq[(Int, Int)]) {
    private var piece = 0
    private var off = pieces.head._1
    private def remaining: Int = pieces(piece)._2 - off
    private def advancePiece(): Unit = { piece += 1; off = pieces(piece)._1 }
    def u8c(): Int = { if (remaining == 0) advancePiece(); val v = u8(stream, off); off += 1; v }
    def u16c(): Int = u8c() | (u8c() << 8)
    def i32c(): Int = u16c() | (u16c() << 16)
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) {
        if (remaining == 0) advancePiece()
        val k = math.min(left, remaining); off += k; left -= k
      }
    }
    /** XLUnicodeRichExtendedString. */
    def readString(): String = {
      val cch = u16c()
      var flags = u8c()
      val cRun = if ((flags & 0x08) != 0) u16c() else 0
      val cbExt = if ((flags & 0x04) != 0) i32c() else 0
      val sb = new java.lang.StringBuilder(cch)
      var read = 0
      while (read < cch) {
        if (remaining == 0) { advancePiece(); flags = (flags & ~1) | (u8c() & 1) }
        val wide = (flags & 1) != 0
        val fit = if (wide) remaining / 2 else remaining
        val take = math.min(cch - read, fit)
        // a wide read with 1 byte left in the piece would otherwise
        // make no progress — corrupt input must throw, not hang
        require(take > 0,
          s"corrupt SST: string piece too short ($remaining bytes, wide=$wide)")
        var i = 0
        while (i < take) {
          val ch = if (wide) u16(stream, off + 2 * i) else u8(stream, off + i)
          sb.append(ch.toChar)
          i += 1
        }
        off += (if (wide) 2 * take else take)
        read += take
      }
      skip(4 * cRun + cbExt)
      sb.toString
    }
  }

  /** Parse the shared-string table starting at the SST record at
    * `pos`, consuming any CONTINUE records that follow it. */
  private def parseSst(stream: Array[Byte], pos: Int): Vector[String] = {
    var pieces = List.empty[(Int, Int)]
    var p = pos
    var first = true
    while (p + 4 <= stream.length &&
        (first && u16(stream, p) == RecSst || !first && u16(stream, p) == RecContinue)) {
      val sz = u16(stream, p + 2)
      val start = p + 4 + (if (first) 8 else 0) // skip cstTotal/cstUnique once
      pieces ::= (start, p + 4 + sz)
      p += 4 + sz
      first = false
    }
    val cur = new SstCursor(stream, pieces.reverse)
    val cstUnique = i32(stream, pos + 8)
    Vector.fill(cstUnique)(cur.readString())
  }

  /** Parse the first worksheet of a `.xls` file into the same dense
    * all-string grid [[Xlsx.parseGrid]] produces. */
  def parseGrid(path: String): Vector[Array[String]] = {
    val stream = workbookStream(Files.readAllBytes(Paths.get(path)))

    // Pass 1 — workbook globals: SST and the first BOUNDSHEET offset.
    var sst = Vector.empty[String]
    var sheetPos = -1
    var p = 0
    var done = false
    while (!done && p + 4 <= stream.length) {
      val id = u16(stream, p)
      val sz = u16(stream, p + 2)
      id match {
        case RecSst => sst = parseSst(stream, p)
        case RecBoundSheet if sheetPos < 0 => sheetPos = i32(stream, p + 4)
        case RecEof => done = true
        case _ =>
      }
      p += 4 + sz
    }
    require(sheetPos >= 0, "no BOUNDSHEET record — not a BIFF8 workbook")

    // Pass 2 — the sheet substream: collect (row, col) -> value.
    val cells = scala.collection.mutable.LinkedHashMap.empty[(Int, Int), String]
    var maxRow = -1
    var maxCol = -1
    def put(row: Int, col: Int, v: String): Unit = {
      cells((row, col)) = v
      if (row > maxRow) maxRow = row
      if (col > maxCol) maxCol = col
    }
    p = sheetPos
    done = false
    while (!done && p + 4 <= stream.length) {
      val id = u16(stream, p)
      val sz = u16(stream, p + 2)
      val o = p + 4
      id match {
        case RecLabelSst =>
          put(u16(stream, o), u16(stream, o + 2), sst(i32(stream, o + 6)))
        case RecLabel =>
          val cch = u16(stream, o + 6)
          val grbit = u8(stream, o + 8)
          val wide = (grbit & 1) != 0
          // rich-text run count (2 B, grbit 0x08) and ext length (4 B,
          // grbit 0x04) sit BETWEEN the grbit and the character data;
          // their payloads follow the characters and need no skip here
          val so = o + 9 + (if ((grbit & 0x08) != 0) 2 else 0) +
            (if ((grbit & 0x04) != 0) 4 else 0)
          val s = if (wide) new String(stream, so, cch * 2, StandardCharsets.UTF_16LE)
            else new String(stream, so, cch, StandardCharsets.ISO_8859_1)
          put(u16(stream, o), u16(stream, o + 2), s)
        case RecNumber =>
          put(u16(stream, o), u16(stream, o + 2), fmtNum(f64(stream, o + 6)))
        case RecRk =>
          put(u16(stream, o), u16(stream, o + 2), fmtNum(rkValue(i32(stream, o + 6))))
        case RecMulRk =>
          val row = u16(stream, o)
          val colFirst = u16(stream, o + 2)
          val n = (sz - 6) / 6
          var k = 0
          while (k < n) {
            put(row, colFirst + k, fmtNum(rkValue(i32(stream, o + 4 + 6 * k + 2))))
            k += 1
          }
        case RecBoolErr =>
          if (u8(stream, o + 7) == 0) // value (not error) cell
            put(u16(stream, o), u16(stream, o + 2),
              if (u8(stream, o + 6) == 1) "TRUE" else "FALSE")
        case RecFormula => // surface the cached numeric result when present
          val res = java.util.Arrays.copyOfRange(stream, o + 6, o + 14)
          if (u16(res, 6) != 0xFFFF) // IEEE double (string/bool/err results skipped)
            put(u16(stream, o), u16(stream, o + 2), fmtNum(f64(res, 0)))
        case RecEof => done = true
        case _ =>
      }
      p += 4 + sz
    }

    (0 to maxRow).iterator.map { r =>
      Array.tabulate[String](maxCol + 1)(c => cells.getOrElse((r, c), null))
    }.toVector
  }
}
