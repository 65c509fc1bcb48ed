package graft.tools

import java.io.ByteArrayOutputStream

/** Test-side generator of legacy `.xls` fixtures: BIFF8 records inside
  * a hand-built CFB container, following the public [MS-CFB]/[MS-XLS]
  * layouts directly (no xls-writing library exists in this offline
  * environment). Emits both container shapes the reader must handle:
  * the mini-stream path (workbook < 4096 bytes) and the regular-FAT
  * path, and can split an SST string across a CONTINUE record. */
object MakeXlsFixture {

  // ------------------------------------------------------------ LE writers

  private final class Buf {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Buf = { out.write(v & 0xFF); this }
    def u16(v: Int): Buf = { u8(v); u8(v >> 8) }
    def i32(v: Int): Buf = { u16(v); u16(v >> 16) }
    def f64(v: Double): Buf = {
      val bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).foreach(i => u8((bits >> (8 * i)).toInt))
      this
    }
    def bytes(b: Array[Byte]): Buf = { out.write(b); this }
    def ascii(s: String): Buf = bytes(s.getBytes("ISO-8859-1"))
    def utf16(s: String): Buf = bytes(s.getBytes("UTF-16LE"))
    def pad(to: Int): Buf = { while (out.size() < to) u8(0); this }
    def result(): Array[Byte] = out.toByteArray
  }

  private def rec(id: Int, payload: Array[Byte]): Array[Byte] =
    new Buf().u16(id).u16(payload.length).bytes(payload).result()

  // ------------------------------------------------------------ BIFF8 bits

  private def bof(dt: Int): Array[Byte] =
    rec(0x0809, new Buf().u16(0x0600).u16(dt).u16(0).u16(0).i32(0).i32(0).result())

  private def eof(): Array[Byte] = rec(0x000A, Array.empty)

  private def boundSheet(pos: Int, name: String): Array[Byte] =
    rec(0x0085, new Buf().i32(pos).u16(0).u8(name.length).u8(0).ascii(name).result())

  private def sstString(s: String): Array[Byte] = {
    val wide = s.exists(_ > 0xFF)
    val b = new Buf().u16(s.length).u8(if (wide) 1 else 0)
    if (wide) b.utf16(s) else b.ascii(s)
    b.result()
  }

  /** SST record for `strings`; when `splitLastAt` is set, the LAST TWO
    * strings each spill into a CONTINUE record (restating the encoding
    * grbit, per [MS-XLS]): the second-to-last as compressed ASCII, the
    * last as wide UTF-16 — exercising both grbit restatements. */
  private def sst(strings: Seq[String], splitLastAt: Option[Int]): Array[Byte] = {
    splitLastAt match {
      case None =>
        val head = new Buf().i32(strings.length).i32(strings.length)
        strings.foreach(s => head.bytes(sstString(s)))
        rec(0x00FC, head.result())
      case Some(cut) =>
        val asciiSplit = strings(strings.length - 2)
        val wideSplit = strings.last
        require(!asciiSplit.exists(_ > 0xFF) && cut < asciiSplit.length &&
          wideSplit.exists(_ > 0xFF) && cut < wideSplit.length, "split fixture shape")
        val head = new Buf().i32(strings.length).i32(strings.length)
        strings.dropRight(2).foreach(s => head.bytes(sstString(s)))
        head.u16(asciiSplit.length).u8(0).ascii(asciiSplit.substring(0, cut))
        // CONTINUE 1: rest of the ascii string (grbit 0), then the wide
        // string's header + first chars
        val cont1 = new Buf().u8(0).ascii(asciiSplit.substring(cut))
          .u16(wideSplit.length).u8(1).utf16(wideSplit.substring(0, cut))
        // CONTINUE 2: rest of the wide string (grbit restated as 1)
        val cont2 = new Buf().u8(1).utf16(wideSplit.substring(cut))
        rec(0x00FC, head.result()) ++
          rec(0x003C, cont1.result()) ++ rec(0x003C, cont2.result())
    }
  }

  private def labelSst(row: Int, col: Int, isst: Int): Array[Byte] =
    rec(0x00FD, new Buf().u16(row).u16(col).u16(0).i32(isst).result())

  private def number(row: Int, col: Int, v: Double): Array[Byte] =
    rec(0x0203, new Buf().u16(row).u16(col).u16(0).f64(v).result())

  private def rkRec(row: Int, col: Int, rk: Int): Array[Byte] =
    rec(0x027E, new Buf().u16(row).u16(col).u16(0).i32(rk).result())

  private def mulRk(row: Int, colFirst: Int, rks: Seq[Int]): Array[Byte] = {
    val b = new Buf().u16(row).u16(colFirst)
    rks.foreach(rk => b.u16(0).i32(rk))
    b.u16(colFirst + rks.length - 1)
    rec(0x00BD, b.result())
  }

  def rkInt(v: Int): Int = (v << 2) | 2
  def rkInt100(centiV: Int): Int = (centiV << 2) | 3
  def rkDouble(v: Double): Int =
    ((java.lang.Double.doubleToLongBits(v) >>> 32) & 0xFFFFFFFCL).toInt

  private def boolErr(row: Int, col: Int, value: Boolean): Array[Byte] =
    rec(0x0205, new Buf().u16(row).u16(col).u16(0)
      .u8(if (value) 1 else 0).u8(0).result())

  /** Old-style inline LABEL (pre-SST) — wide iff the text needs it. */
  private def label(row: Int, col: Int, s: String): Array[Byte] = {
    val wide = s.exists(_ > 0xFF)
    val b = new Buf().u16(row).u16(col).u16(0).u16(s.length).u8(if (wide) 1 else 0)
    if (wide) b.utf16(s) else b.ascii(s)
    rec(0x0204, b.result())
  }

  /** LABEL with rich-text runs AND an ext block: the 2-byte run count
    * and 4-byte ext length sit between the grbit and the characters
    * ([MS-XLS] XLUnicodeRichExtendedString); their payloads follow the
    * characters. Readers that treat offset grbit+1 as character data
    * misparse these. */
  private def labelRich(row: Int, col: Int, s: String): Array[Byte] = {
    val wide = s.exists(_ > 0xFF)
    val b = new Buf().u16(row).u16(col).u16(0).u16(s.length)
      .u8((if (wide) 1 else 0) | 0x08 | 0x04)
      .u16(1) // cRun
      .i32(2) // cbExtRst
    if (wide) b.utf16(s) else b.ascii(s)
    b.u16(0).u16(0) // the single FormatRun (ich, ifnt)
    b.u16(0) // the 2-byte ExtRst payload
    rec(0x0204, b.result())
  }

  /** FORMULA with a cached IEEE-double result (the only result kind the
    * reader surfaces). */
  private def formulaNum(row: Int, col: Int, cached: Double): Array[Byte] =
    rec(0x0006, new Buf().u16(row).u16(col).u16(0).f64(cached)
      .u16(0).i32(0).u16(0).result()) // grbit + chn + empty parsed expr

  /** The BIFF8 workbook stream: globals (SST, BOUNDSHEET) + one sheet.
    * `padRows` inflates the sheet with extra NUMBER rows to push the
    * stream over the 4096-byte mini cutoff. */
  def workbookStream(header: Seq[String], strings: Seq[(Int, Int, String)],
      numbers: Seq[(Int, Int, Double)], rks: Seq[(Int, Int, Int)],
      mulRks: Seq[(Int, Int, Seq[Int])], padRows: Int,
      splitLastSstAt: Option[Int], extras: Boolean = true,
      padCols: Int = 1): Array[Byte] = {
    val sstStrings = (header ++ strings.map(_._3)).distinct
    val sstIndex = sstStrings.zipWithIndex.toMap
    val globalsTail = new Buf()
    val sheet = new Buf()
    sheet.bytes(bof(0x0010))
    header.zipWithIndex.foreach { case (h, c) => sheet.bytes(labelSst(0, c, sstIndex(h))) }
    strings.foreach { case (r, c, s) => sheet.bytes(labelSst(r, c, sstIndex(s))) }
    numbers.foreach { case (r, c, v) => sheet.bytes(number(r, c, v)) }
    rks.foreach { case (r, c, rk) => sheet.bytes(rkRec(r, c, rk)) }
    mulRks.foreach { case (r, cf, xs) => sheet.bytes(mulRk(r, cf, xs)) }
    if (extras) { // one of each remaining cell kind the reader supports
      sheet.bytes(boolErr(4, 0, value = true))
      sheet.bytes(label(4, 1, "Инлайн текст"))
      sheet.bytes(formulaNum(4, 2, 41.5))
      sheet.bytes(labelRich(4, 3, "Rich текст"))
    }
    // BIFF8 rows are u16 (65536 max) — big sheets pad WIDE, not long
    require(1000 + padRows <= 65536, "BIFF8 row index overflows u16")
    (0 until padRows).foreach(i => (0 until padCols).foreach(c =>
      sheet.bytes(number(1000 + i, c, (i.toLong * padCols + c).toDouble))))
    sheet.bytes(eof())

    // assemble: globals BOF + SST + BOUNDSHEET(pos) + EOF, then sheet —
    // the BOUNDSHEET offset needs the globals length, which needs the
    // BOUNDSHEET record length (fixed: 4-byte pos + 2 + 2 + name), so
    // compute with a placeholder first
    val sstRec = sst(sstStrings, splitLastSstAt)
    def globals(pos: Int) =
      bof(0x0005) ++ sstRec ++ boundSheet(pos, "Sheet1") ++ eof()
    val pos = globals(0).length
    globals(pos) ++ sheet.result()
  }

  // --------------------------------------------------------- CFB container

  private val DIFSECT = -4
  private val FATSECT = -3
  private val END = -2
  private val FREE = -1

  private def cfbHeader(sectorSize: Int, numFat: Int, firstDir: Int,
      firstMiniFat: Int, numMiniFat: Int, fatSids: Seq[Int],
      firstDifat: Int, numDifat: Int, numDirSectors: Int): Array[Byte] = {
    val v4 = sectorSize == 4096
    val b = new Buf()
    b.bytes(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    b.pad(24) // CLSID
    b.u16(0x003E).u16(if (v4) 4 else 3) // minor/major
    b.u16(0xFFFE) // little-endian
    b.u16(if (v4) 12 else 9).u16(6) // sector shift, mini sector 64
    b.pad(40) // reserved (34-40)
    b.i32(if (v4) numDirSectors else 0) // numDirSectors (v4 only)
    b.i32(numFat)
    b.i32(firstDir)
    b.i32(0) // transaction
    b.i32(4096) // mini cutoff
    b.i32(firstMiniFat)
    b.i32(numMiniFat)
    b.i32(firstDifat)
    b.i32(numDifat)
    fatSids.take(109).foreach(b.i32)
    (math.min(fatSids.length, 109) until 109).foreach(_ => b.i32(FREE))
    // a v4 header still occupies one whole 4096-byte sector
    if (v4) b.pad(sectorSize)
    b.result()
  }

  private def dirEntry(name: String, objType: Int, child: Int, start: Int,
      size: Int): Array[Byte] = {
    val b = new Buf()
    b.utf16(name).pad(64)
    b.u16(if (name.isEmpty) 0 else (name.length + 1) * 2)
    b.u8(objType).u8(1) // black
    b.i32(FREE).i32(FREE).i32(child)
    b.pad(96 + 4) // CLSID + state
    b.pad(116) // timestamps
    b.i32(start)
    b.i32(size).i32(0)
    b.result()
  }

  /** Wrap a workbook stream in a CFB container, picking the mini-stream
    * or regular-FAT shape by the 4096-byte rule exactly like a real
    * writer would. The regular path sizes its FAT for any workbook,
    * spilling FAT sids past the 109 header slots into a DIFAT sector
    * chain; `sectorSize = 4096` emits an [MS-CFB] major-version-4
    * container (header padded to the full first sector). */
  def cfb(workbook: Array[Byte], sectorSize: Int = 512): Array[Byte] = {
    require(sectorSize == 512 || sectorSize == 4096, "CFB sector size")
    val epf = sectorSize / 4 // FAT entries per sector
    def nSectors(len: Int): Int = (len + sectorSize - 1) / sectorSize
    val out = new Buf()
    if (workbook.length < 4096 && sectorSize == 512) {
      val miniCount = (workbook.length + 63) / 64
      val containerSectors = nSectors(miniCount * 64)
      // plan: 0 FAT | 1 dir | 2 miniFAT | 3.. container
      val fat = new Buf()
      fat.i32(FATSECT).i32(END).i32(END)
      (0 until containerSectors).foreach(i =>
        fat.i32(if (i == containerSectors - 1) END else 3 + i + 1))
      (3 + containerSectors until 128).foreach(_ => fat.i32(FREE))
      val miniFat = new Buf()
      (0 until miniCount).foreach(i => miniFat.i32(if (i == miniCount - 1) END else i + 1))
      (miniCount until 128).foreach(_ => miniFat.i32(FREE))
      val dir = new Buf()
      dir.bytes(dirEntry("Root Entry", 5, 1, 3, miniCount * 64))
      dir.bytes(dirEntry("Workbook", 2, FREE, 0, workbook.length))
      dir.bytes(dirEntry("", 0, FREE, FREE, 0))
      dir.bytes(dirEntry("", 0, FREE, FREE, 0))
      out.bytes(cfbHeader(512, 1, 1, 2, 1, Seq(0), END, 0, 1))
      out.bytes(fat.result()).bytes(dir.result()).bytes(miniFat.result())
      out.bytes(workbook).pad(512 + (3 + containerSectors) * 512)
    } else {
      val wbSectors = nSectors(workbook.length)
      val dirSectors = nSectors(4 * 128)
      // Fixpoint for the FAT size: the FAT maps EVERY sector (DIFAT +
      // FAT + dir + workbook), and the DIFAT count depends on the FAT
      // count — iterate until both stabilize (monotone, converges).
      var fatCnt = 1
      var difatCnt = 0
      (0 until 16).foreach { _ =>
        fatCnt = (difatCnt + fatCnt + dirSectors + wbSectors + epf - 1) / epf
        difatCnt = if (fatCnt <= 109) 0 else (fatCnt - 109 + epf - 2) / (epf - 1)
      }
      // plan: 0.. DIFAT | .. FAT | .. dir | .. workbook
      val fatSids = (difatCnt until difatCnt + fatCnt).toVector
      val dirStart = difatCnt + fatCnt
      val wbStart = dirStart + dirSectors
      val total = wbStart + wbSectors
      require(difatCnt + fatCnt + dirSectors + wbSectors <= fatCnt * epf, "FAT fixpoint")
      val fat = new Buf()
      (0 until difatCnt).foreach(_ => fat.i32(DIFSECT))
      (0 until fatCnt).foreach(_ => fat.i32(FATSECT))
      (0 until dirSectors).foreach(i =>
        fat.i32(if (i == dirSectors - 1) END else dirStart + i + 1))
      (0 until wbSectors).foreach(i =>
        fat.i32(if (i == wbSectors - 1) END else wbStart + i + 1))
      (total until fatCnt * epf).foreach(_ => fat.i32(FREE))
      val difatBuf = new Buf()
      val overflow = fatSids.drop(109)
      (0 until difatCnt).foreach { i =>
        val slice = overflow.slice(i * (epf - 1), (i + 1) * (epf - 1))
        slice.foreach(difatBuf.i32)
        (slice.length until epf - 1).foreach(_ => difatBuf.i32(FREE))
        difatBuf.i32(if (i == difatCnt - 1) END else i + 1)
      }
      val dir = new Buf()
      dir.bytes(dirEntry("Root Entry", 5, 1, END, 0))
      dir.bytes(dirEntry("Workbook", 2, FREE, wbStart, workbook.length))
      dir.bytes(dirEntry("", 0, FREE, FREE, 0))
      dir.bytes(dirEntry("", 0, FREE, FREE, 0))
      dir.pad(dirSectors * sectorSize)
      out.bytes(cfbHeader(sectorSize, fatCnt, dirStart, END, 0, fatSids,
        if (difatCnt > 0) 0 else END, difatCnt, dirSectors))
      out.bytes(difatBuf.result()).bytes(fat.result()).bytes(dir.result())
      out.bytes(workbook).pad(sectorSize + total * sectorSize)
    }
    out.result()
  }

  /** Write a small price-list-shaped `.xls`; `big = true` forces the
    * regular-FAT container and splits the last two SST strings (one
    * compressed, one wide) across CONTINUE records. `sectorSize = 4096`
    * emits a CFB major-version-4 container. */
  def write(path: String, big: Boolean, sectorSize: Int = 512): Unit = {
    val header = Seq("Артикул", "Название", "Цена")
    val strings = Seq((1, 1, "Кабель USB"), (2, 1, "Адаптер 220В"),
      (3, 1, "SplitMarker-" + ("x" * 40)), (1, 3, "Широкий-" + ("ω" * 27)))
    val numbers = Seq((1, 0, 10001.0), (1, 2, 99.9))
    val rks = Seq((2, 0, rkInt(10002)), (2, 2, rkInt100(12345)), (3, 0, rkDouble(2.5)))
    val mulRks = Seq((3, 2, Seq(rkInt(7), rkInt100(999))))
    val wb = workbookStream(header, strings, numbers, rks, mulRks,
      padRows = if (big) 300 else 0,
      splitLastSstAt = if (big) Some(15) else None)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), cfb(wb, sectorSize))
  }

  /** Write an oversized `.xls` (same cell content as `write(big=true)`
    * plus `padRows` 12-column NUMBER rows) big enough that the
    * container's FAT sector list overflows the 109 header DIFAT slots —
    * the shape real multi-megabyte price lists produce (BIFF8 caps rows
    * at 65536, so bulk comes from row WIDTH). */
  def writeHuge(path: String, padRows: Int): Unit = {
    val header = Seq("Артикул", "Название", "Цена")
    val strings = Seq((1, 1, "Кабель USB"), (2, 1, "Адаптер 220В"),
      (3, 1, "SplitMarker-" + ("x" * 40)), (1, 3, "Широкий-" + ("ω" * 27)))
    val numbers = Seq((1, 0, 10001.0), (1, 2, 99.9))
    val rks = Seq((2, 0, rkInt(10002)), (2, 2, rkInt100(12345)), (3, 0, rkDouble(2.5)))
    val mulRks = Seq((3, 2, Seq(rkInt(7), rkInt100(999))))
    val wb = workbookStream(header, strings, numbers, rks, mulRks,
      padRows = padRows, splitLastSstAt = Some(15), padCols = 12)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), cfb(wb))
  }

  /** Write an `.xls` whose SST breaks a WIDE string's bytes at an ODD
    * offset into its CONTINUE — structurally corrupt ([MS-XLS] requires
    * the break on a character boundary). The reader must throw, not
    * hang. */
  def writeCorruptSstXls(path: String): Unit = {
    val s = "ΩΩΩΩ" // 4 wide chars
    val wideBytes = s.getBytes("UTF-16LE")
    val head = new Buf().i32(1).i32(1)
      .u16(s.length).u8(1).bytes(wideBytes.take(3)) // 1.5 chars: odd split
    val cont = new Buf().u8(1).bytes(wideBytes.drop(3))
    val sstRec = rec(0x00FC, head.result()) ++ rec(0x003C, cont.result())
    val sheet = bof(0x0010) ++ labelSst(0, 0, 0) ++ eof()
    def globals(pos: Int) = bof(0x0005) ++ sstRec ++ boundSheet(pos, "S") ++ eof()
    val wb = globals(globals(0).length) ++ sheet
    java.nio.file.Files.write(java.nio.file.Paths.get(path), cfb(wb))
  }
}
