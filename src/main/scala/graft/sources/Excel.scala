package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Minimal XLSX connector, pure JDK (java.util.zip + SAX) — no external
  * dependency (this container has no POI; XLSX is a zip of XML parts).
  *
  * Covers the reference's Excel surface (SURVEY.md S4-S6, K2-K3):
  *   - read: sheet by name or first, `skipRows`, 1..k header rows with
  *     forward-fill + "_"-join flattening (the 4-row hierarchical header
  *     of Financial Snapshot Preprocess.ipynb:195-256), shared & inline
  *     strings, all columns ingested as StringType (the reference's
  *     pandas `object` ingest; downstream coercion via Compat).
  *   - write: one sheet per DataFrame, inline strings, header row.
  *
  * Deliberately driver-side: the reference reads/writes small report
  * workbooks (hundreds..tens of thousands of rows). Large tabular data
  * belongs in parquet; this connector exists for format parity, with a
  * row-count guard to fail fast on misuse.
  */
object Excel {

  val maxDriverRows = 1000000

  // ---- read ----------------------------------------------------------

  /** Read one sheet into a DataFrame.
    * @param headerRows 0 → synthesized c0..cN names; 1 → plain header;
    *                   k>1 → hierarchical header flattened by
    *                   forward-filling each header row and joining
    *                   non-empty parts with "_" (pandas tidy() parity).
    * @param inferTypes false (default) → every column StringType (the
    *                   reference's pandas `object` ingest; downstream
    *                   coercion via Compat). true → honor the xlsx cell
    *                   `t` attribute and number-format styles per column,
    *                   like `pd.read_excel` delivers typed numerics and
    *                   datetimes (json_cleaning.ipynb:74-107 dtype dump;
    *                   Financial Snapshot Preprocess.ipynb:77): a column
    *                   whose non-empty cells are all integer numerics →
    *                   LongType, all numerics → DoubleType, all
    *                   date-formatted numerics → TimestampType (serial
    *                   epoch 1899-12-30), all booleans → BooleanType;
    *                   any mix falls back to StringType (pandas object).
    */
  def read(spark: SparkSession, path: String, sheet: Option[String] = None,
           skipRows: Int = 0, headerRows: Int = 1,
           inferTypes: Boolean = false): DataFrame = {
    val rows = readSheetCellsTyped(path, sheet).drop(skipRows)
    if (rows.isEmpty)
      return spark.createDataFrame(new java.util.ArrayList[Row](), StructType(Nil))
    val width = rows.map(_.length).max
    val padded = rows.map(r => r.padTo(width, XCell("", 'e')))

    val (names, data) =
      if (headerRows == 0) ((0 until width).map(i => s"c$i"), padded)
      else {
        val headers = padded.take(headerRows).map(r => forwardFill(r.map(_.text)))
        val flat = (0 until width).map { i =>
          val parts = headers.map(_(i)).filter(_.nonEmpty)
          if (parts.isEmpty) s"c$i" else parts.mkString("_")
        }
        (dedupeNames(flat), padded.drop(headerRows))
      }

    if (!inferTypes) {
      val schema = StructType(names.map(n => StructField(n, StringType, nullable = true)))
      val javaRows = data.map(r =>
        Row.fromSeq(r.map(c => if (c.text.isEmpty) null else c.text)): Row).asJava
      return spark.createDataFrame(javaRows, schema)
    }

    import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType, TimestampType}
    val longRe = """-?\d+""".r
    val colTypes = (0 until width).map { i =>
      val kinds = data.iterator.map(_(i)).filter(_.kind != 'e').toSeq
      if (kinds.isEmpty) StringType
      else if (kinds.forall(_.kind == 'd')) TimestampType
      else if (kinds.forall(_.kind == 'b')) BooleanType
      else if (kinds.forall(_.kind == 'n'))
        // openpyxl parity: a cell is integral iff its stored text is a
        // plain integer literal; one "3.5" (or "1e30") → float64 column
        if (kinds.forall(c => longRe.matches(c.text) &&
            scala.util.Try(c.text.toLong).isSuccess)) LongType else DoubleType
      else StringType
    }
    val schema = StructType(names.zip(colTypes).map { case (n, t) =>
      StructField(n, t, nullable = true) })
    val javaRows = data.map { r =>
      Row.fromSeq(r.zip(colTypes).map { case (c, t) =>
        if (c.kind == 'e' || c.text.isEmpty) null
        else t match {
          case TimestampType => serialToTimestamp(c.text.toDouble)
          case LongType => c.text.toLong
          case DoubleType => c.text.toDouble
          case BooleanType => c.text == "1" || c.text.equalsIgnoreCase("true")
          case _ => c.text
        }
      }): Row
    }.asJava
    spark.createDataFrame(javaRows, schema)
  }

  /** Excel serial day (epoch 1899-12-30, fraction = time of day) →
    * timestamp; rounded to the millisecond to absorb the serial's double
    * representation error (openpyxl rounds at microseconds the same way).
    */
  private def serialToTimestamp(serial: Double): java.sql.Timestamp =
    new java.sql.Timestamp(math.round((serial - 25569.0) * 86400000.0))

  private def timestampToSerial(ts: java.sql.Timestamp): Double =
    ts.getTime.toDouble / 86400000.0 + 25569.0

  /** Sheet names in workbook order. */
  def sheetNames(path: String): Seq[String] = {
    val zf = openXlsx(path)
    try workbookSheets(zf).map(_._1)
    finally zf.close()
  }

  /** Open a workbook as XLSX (zip/XML), failing LOUDLY on the legacy
    * binary `.xls` container instead of with an opaque zip error.
    * `.xls` is an OLE2 compound document (magic D0CF11E0A1B11AE1) that
    * pandas routes to xlrd; no reference workbook uses it (every cited
    * file is `.xlsx`), so parity needs only an explicit unsupported-
    * format diagnostic pointing at the conversion path.
    */
  private def openXlsx(path: String): ZipFile = {
    val ole2 = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
    val head = {
      val in = new java.io.FileInputStream(path)
      try in.readNBytes(8) finally in.close()
    }
    if (java.util.Arrays.equals(head, ole2))
      throw new IllegalArgumentException(
        s"$path is a legacy binary .xls workbook (OLE2 compound file); " +
          "this source reads XLSX (zip/XML) only — re-save as .xlsx")
    try new ZipFile(path)
    catch { case e: java.util.zip.ZipException =>
      throw new IllegalArgumentException(
        s"$path is not an XLSX workbook (not a zip container): ${e.getMessage}", e)
    }
  }

  private def forwardFill(r: Seq[String]): Seq[String] =
    r.scanLeft("") { (prev, v) => if (v.nonEmpty) v else prev }.drop(1)

  private def dedupeNames(names: Seq[String]): Seq[String] = {
    val seen = mutable.Map.empty[String, Int]
    names.map { n =>
      val k = seen.getOrElse(n, 0)
      seen(n) = k + 1
      if (k == 0) n else s"${n}_$k"
    }
  }

  /** (sheetName, partName) pairs from workbook.xml + its rels. */
  private def workbookSheets(zf: ZipFile): Seq[(String, String)] = {
    def entryText(name: String): Option[String] =
      Option(zf.getEntry(name)).map { e =>
        new String(zf.getInputStream(e).readAllBytes(), StandardCharsets.UTF_8)
      }
    val wb = entryText("xl/workbook.xml").getOrElse(
      throw new IllegalArgumentException("not an xlsx: missing xl/workbook.xml"))
    val rels = entryText("xl/_rels/workbook.xml.rels").getOrElse("")
    val relMap = """<Relationship[^>]*Id="([^"]+)"[^>]*Target="([^"]+)"""".r
      .findAllMatchIn(rels).map(m => m.group(1) -> m.group(2)).toMap ++
      """<Relationship[^>]*Target="([^"]+)"[^>]*Id="([^"]+)"""".r
        .findAllMatchIn(rels).map(m => m.group(2) -> m.group(1)).toMap
    """<sheet[^>]*name="([^"]+)"[^>]*r:id="([^"]+)"""".r.findAllMatchIn(wb).map { m =>
      val target = relMap.getOrElse(m.group(2), "worksheets/sheet1.xml")
      val part = if (target.startsWith("/")) target.drop(1)
                 else if (target.startsWith("xl/")) target else s"xl/$target"
      m.group(1) -> part
    }.toSeq
  }

  /** A raw sheet cell: `text` is the stored value (shared/inline string
    * content, or the literal `<v>` body for numerics/booleans); `kind`
    * is 's' string, 'n' numeric, 'd' date-formatted numeric, 'b'
    * boolean, 'e' empty.
    */
  private case class XCell(text: String, kind: Char)

  /** numFmtIds Excel renders as dates: the builtin date/time ranges plus
    * custom codes containing a date token outside quotes/brackets —
    * the same heuristic openpyxl's `is_date_format` applies.
    */
  private def dateStyleIndexes(zf: ZipFile): Set[Int] = {
    val entry = Option(zf.getEntry("xl/styles.xml")).getOrElse(return Set.empty)
    val xml = new String(zf.getInputStream(entry).readAllBytes(), StandardCharsets.UTF_8)
    val builtinDate = ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet
    def isDateCode(code: String): Boolean = {
      val bare = code.replaceAll("\"[^\"]*\"", "").replaceAll("\\[[^\\]]*\\]", "")
        .replaceAll("\\\\.", "")
      bare.exists(c => "ymdhYMDH".indexOf(c) >= 0) ||
        bare.contains("ss") || bare.contains("SS")
    }
    val customDate = """<numFmt[^>]*numFmtId="(\d+)"[^>]*formatCode="([^"]*)"""".r
      .findAllMatchIn(xml)
      .collect { case m if isDateCode(unescape(m.group(2))) => m.group(1).toInt }
      .toSet
    val dateFmtIds = builtinDate ++ customDate
    """(?s)<cellXfs[^>]*>(.*?)</cellXfs>""".r.findFirstMatchIn(xml) match {
      case None => Set.empty
      case Some(sect) =>
        """<xf[\s/>]([^>]*)""".r.findAllMatchIn(sect.group(1)).zipWithIndex
          .collect { case (m, i) if """numFmtId="(\d+)"""".r
            .findFirstMatchIn(m.group(1))
            .exists(f => dateFmtIds(f.group(1).toInt)) => i }
          .toSet
    }
  }

  /** All cells of a sheet, row-major, with per-cell kind (sparse → 'e'). */
  private def readSheetCellsTyped(path: String, sheet: Option[String]): Seq[Seq[XCell]] = {
    val zf = openXlsx(path)
    try {
      val sheets = workbookSheets(zf)
      val part = sheet match {
        case Some(name) => sheets.find(_._1 == name).map(_._2).getOrElse(
          throw new IllegalArgumentException(
            s"sheet '$name' not found; have ${sheets.map(_._1).mkString(", ")}"))
        case None => sheets.headOption.map(_._2).getOrElse("xl/worksheets/sheet1.xml")
      }
      val shared: IndexedSeq[String] = Option(zf.getEntry("xl/sharedStrings.xml")).map { e =>
        val xml = new String(zf.getInputStream(e).readAllBytes(), StandardCharsets.UTF_8)
        """(?s)<si>(.*?)</si>""".r.findAllMatchIn(xml)
          .map(m => """(?s)<t[^>]*>([^<]*)</t>""".r.findAllMatchIn(m.group(1))
            .map(t => unescape(t.group(1))).mkString)
          .toIndexedSeq
      }.getOrElse(IndexedSeq.empty)
      val dateStyles = dateStyleIndexes(zf)

      val sheetXml = new String(
        zf.getInputStream(zf.getEntry(part)).readAllBytes(), StandardCharsets.UTF_8)
      val rowRe = """(?s)<row[^>]*>(.*?)</row>""".r
      val cellRe = """(?s)<c(\s[^>]*?)?(?:/>|>(.*?)</c>)""".r
      rowRe.findAllMatchIn(sheetXml).map { rm =>
        val cells = mutable.ArrayBuffer.empty[(Int, XCell)]
        cellRe.findAllMatchIn(rm.group(1)).foreach { cm =>
          val attrs = Option(cm.group(1)).getOrElse("")
          val body = Option(cm.group(2)).getOrElse("")
          val ref = """r="([A-Z]+)\d+"""".r.findFirstMatchIn(attrs).map(_.group(1))
          val idx = ref.map(colIndex).getOrElse(cells.size)
          val t = """t="([^"]+)"""".r.findFirstMatchIn(attrs).map(_.group(1)).getOrElse("n")
          val cell = t match {
            case "inlineStr" =>
              XCell("""<t[^>]*>([^<]*)</t>""".r.findAllMatchIn(body)
                .map(m => unescape(m.group(1))).mkString, 's')
            case "s" =>
              XCell("""<v>([^<]*)</v>""".r.findFirstMatchIn(body)
                .map(m => shared(m.group(1).trim.toInt)).getOrElse(""), 's')
            case "str" =>  // formula result string
              XCell("""<v>([^<]*)</v>""".r.findFirstMatchIn(body)
                .map(m => unescape(m.group(1))).getOrElse(""), 's')
            case "b" =>
              XCell("""<v>([^<]*)</v>""".r.findFirstMatchIn(body)
                .map(m => m.group(1).trim).getOrElse(""), 'b')
            case _ =>
              val v = """<v>([^<]*)</v>""".r.findFirstMatchIn(body)
                .map(m => unescape(m.group(1))).getOrElse("")
              val styleIdx = """s="(\d+)"""".r.findFirstMatchIn(attrs)
                .map(_.group(1).toInt)
              val kind =
                if (v.isEmpty) 'e'
                else if (styleIdx.exists(dateStyles)) 'd' else 'n'
              XCell(v, kind)
          }
          cells += ((idx, if (cell.text.isEmpty && cell.kind != 'e')
            cell.copy(kind = 'e') else cell))
        }
        if (cells.isEmpty) Seq.empty[XCell]
        else {
          val width = cells.map(_._1).max + 1
          val arr = Array.fill(width)(XCell("", 'e'))
          cells.foreach { case (i, v) => arr(i) = v }
          arr.toSeq
        }
      }.toSeq
    } finally zf.close()
  }

  private def colIndex(ref: String): Int =
    ref.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1

  // ---- write ---------------------------------------------------------

  /** K4 building blocks: a presentation sheet of static labels, spill
    * formulas, and list data-validations (dropdowns) — the reference's
    * interactive reconciliation workbook (DOR VP Compare.ipynb:566-637,
    * cell a3ee360a: xlsxwriter data_validation + write_formula(FILTER)).
    */
  case class SheetCell(ref: String, text: String)
  /** `formula` without the leading '=' (OOXML `<f>` stores it bare). */
  case class SheetFormula(ref: String, formula: String)
  /** list validation: `sqref` cell(s) restricted to `sourceRange`,
    * e.g. ListValidation("B1", "Matched_Studies!$A$2:$A$101"). */
  case class ListValidation(sqref: String, sourceRange: String)
  case class InteractiveSheet(name: String,
                              labels: Seq[SheetCell] = Nil,
                              formulas: Seq[SheetFormula] = Nil,
                              validations: Seq[ListValidation] = Nil)

  /** 0-based column index → Excel letters (0→A, 26→AA). */
  def colLetters(i: Int): String = {
    var n = i + 1; var s = ""
    while (n > 0) { val r = (n - 1) % 26; s = ('A' + r).toChar.toString + s; n = (n - 1) / 26 }
    s
  }

  /** K4: the reference's Study_Detail layout — "Select Project ID:" label,
    * a dropdown over the matched-ids column, and one spilling FILTER
    * block per detail sheet (headers + formula keyed on the dropdown).
    * `sections`: (label, sourceSheetName, columnNames) per detail block;
    * blocks are laid out like the reference (labels at A3/A10/..., header
    * row two below the label, FILTER formula on the next row).
    */
  def studyDetailSheet(matchedRows: Int,
                       sections: Seq[(String, String, Seq[String])],
                       matchedSheet: String = "Matched_Studies",
                       name: String = "Study_Detail"): InteractiveSheet = {
    val labels = mutable.ArrayBuffer(SheetCell("A1", "Select Project ID:"))
    val formulas = mutable.ArrayBuffer.empty[SheetFormula]
    var row = 3
    sections.foreach { case (label, srcSheet, cols) =>
      labels += SheetCell(s"A$row", label)
      val headerRow = row + 2
      cols.zipWithIndex.foreach { case (c, i) =>
        labels += SheetCell(s"${colLetters(i)}$headerRow", c)
      }
      val lastCol = colLetters(cols.size - 1)
      formulas += SheetFormula(s"A${headerRow + 1}",
        s"FILTER($srcSheet!A2:${lastCol}1048576, $srcSheet!A2:A1048576=" + "$B$1)")
      row += 7
    }
    InteractiveSheet(name, labels.toSeq, formulas.toSeq,
      Seq(ListValidation("B1", s"$matchedSheet!" + "$A$2:$A$" + (matchedRows + 1))))
  }

  /** K2: single-sheet workbook. */
  def write(df: DataFrame, path: String, sheetName: String = "Sheet1"): Unit =
    writeWorkbook(Seq(sheetName -> df), path)

  /** K3 (+K4): multi-sheet workbook (Summary / Matched / Detail fan-out
    * shape), optionally followed by interactive presentation sheets.
    * Collects each frame to the driver — guarded; this is a report sink,
    * not a data sink.
    */
  def writeWorkbook(sheets: Seq[(String, DataFrame)], path: String,
                    interactive: Seq[InteractiveSheet] = Nil): Unit = {
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    try {
      val n = sheets.size + interactive.size
      val allNames = sheets.map(_._1) ++ interactive.map(_.name)
      put("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
          (1 to n).map(i =>
            s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
            .mkString +
          """</Types>""")
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          """</Relationships>""")
      put("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
          allNames.zipWithIndex.map { case (name, i) =>
            s"""<sheet name="${escape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
          }.mkString + """</sheets></workbook>""")
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          (1 to n).map(i =>
            s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
            .mkString +
          s"""<Relationship Id="rId${n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
          """</Relationships>""")
      // minimal styles: xf 0 = General, xf 1 = builtin datetime format 22
      // ("m/d/yy h:mm") — the style typed timestamp cells reference
      put("xl/styles.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
          """<fonts count="1"><font/></fonts><fills count="1"><fill/></fills>""" +
          """<borders count="1"><border/></borders>""" +
          """<cellStyleXfs count="1"><xf/></cellStyleXfs>""" +
          """<cellXfs count="2"><xf numFmtId="0"/>""" +
          """<xf numFmtId="22" applyNumberFormat="1"/></cellXfs></styleSheet>""")
      sheets.zipWithIndex.foreach { case ((_, df), i) =>
        put(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(df))
      }
      interactive.zipWithIndex.foreach { case (sh, j) =>
        put(s"xl/worksheets/sheet${sheets.size + j + 1}.xml", interactiveSheetXml(sh))
      }
    } finally zos.close()
  }

  /** Worksheet XML for a presentation sheet: cells addressed by A1 refs,
    * grouped into `<row r=...>` elements; `<f>` formula cells spill in a
    * modern Excel; `<dataValidations>` emits the dropdowns.
    */
  private def interactiveSheetXml(sh: InteractiveSheet): String = {
    def rowOf(ref: String): Int = ref.dropWhile(_.isLetter).toInt
    val cells: Seq[(Int, String)] =
      sh.labels.map(l => rowOf(l.ref) ->
        s"""<c r="${l.ref}" t="inlineStr"><is><t>${escape(l.text)}</t></is></c>""") ++
      sh.formulas.map(f => rowOf(f.ref) ->
        s"""<c r="${f.ref}"><f>${escape(f.formula)}</f></c>""")
    val rows = cells.groupBy(_._1).toSeq.sortBy(_._1).map { case (r, cs) =>
      // within a row, cells sorted by column letters (length, then text)
      val sorted = cs.map(_._2).sortBy { c =>
        val ref = """r="([A-Z]+)\d+"""".r.findFirstMatchIn(c).get.group(1)
        (ref.length, ref)
      }
      s"""<row r="$r">${sorted.mkString}</row>"""
    }
    val validations =
      if (sh.validations.isEmpty) ""
      else s"""<dataValidations count="${sh.validations.size}">""" +
        sh.validations.map(v =>
          s"""<dataValidation type="list" allowBlank="1" showInputMessage="1" showErrorMessage="1" sqref="${v.sqref}">""" +
            s"""<formula1>${escape(v.sourceRange)}</formula1></dataValidation>""").mkString +
        "</dataValidations>"
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
      rows.mkString + "</sheetData>" + validations + "</worksheet>"
  }

  /** Raw worksheet XML of a sheet (introspection for specs / debugging). */
  def rawSheetXml(path: String, sheet: String): String = {
    val zf = openXlsx(path)
    try {
      val part = workbookSheets(zf).find(_._1 == sheet).map(_._2).getOrElse(
        throw new IllegalArgumentException(s"sheet '$sheet' not found"))
      new String(zf.getInputStream(zf.getEntry(part)).readAllBytes(), StandardCharsets.UTF_8)
    } finally zf.close()
  }

  private def sheetXml(df: DataFrame): String = {
    val header = df.columns.toSeq
    val rows = df.limit(maxDriverRows + 1).collect()
    require(rows.length <= maxDriverRows,
      s"Excel sink is a driver-side report writer; got > $maxDriverRows rows — write parquet/csv instead")
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
    def cell(v: Any): String = v match {
      case null => "<c/>"   // placeholder keeps later cells in position
      case d: Double => s"<c><v>$d</v></c>"
      case f: Float => s"<c><v>$f</v></c>"
      case x: Number => s"<c><v>$x</v></c>"
      case t: java.sql.Timestamp =>
        // typed date cell: serial number + the datetime style (s="1"),
        // so read(inferTypes = true) round-trips it as TimestampType
        s"""<c s="1"><v>${timestampToSerial(t)}</v></c>"""
      // native boolean cell so read(inferTypes = true) round-trips BooleanType
      case b: Boolean => s"""<c t="b"><v>${if (b) 1 else 0}</v></c>"""
      case other => s"<c t=\"inlineStr\"><is><t>${escape(other.toString)}</t></is></c>"
    }
    sb ++= "<row>" + header.map(h => cell(h)).mkString + "</row>"
    rows.foreach { r =>
      sb ++= "<row>" + (0 until r.length).map(i => cell(r.get(i))).mkString + "</row>"
    }
    sb ++= "</sheetData></worksheet>"
    sb.result()
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")
}
