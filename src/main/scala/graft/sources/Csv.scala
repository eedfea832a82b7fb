package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV read/write with the reference's inference semantics
  * (`io.nim:465-605` `readCsvTypedImpl`, `io.nim:217-307` `parseNumber`),
  * re-expressed Spark-first.
  *
  * The reference guesses each column's type from the first <=20 rows
  * (`io.nim:531-552`) and then PROMOTES mid-parse when a later value
  * contradicts the guess (int->float on a float, anything->object on a
  * parse error — `io.nim:332-397`). A sequential "promote as you go"
  * doesn't exist distributed; instead we compute the same fixed point
  * directly: one distributed aggregation votes every column's final type
  * (the promotion lattice is order-independent, so the result is identical
  * to the reference's sequential promotion), then a single typed
  * projection casts. Two scans of the source, both fully parallel, no
  * driver-side sampling — the shape that still works on a 100 TB
  * directory of CSVs.
  *
  * Missing-value semantics match the reference: empty field in a numeric
  * column -> NaN (`io.nim:224-226`), which also means an otherwise-integer
  * column containing empties becomes double (int can't hold NaN). "inf" /
  * "-inf" / "nan" spellings are accepted like `parseNumber`. Empty fields
  * in string columns stay empty strings (the reference's colString has no
  * null representation). Whitespace around separators is skipped like the
  * reference's parser (`io.nim:413-459`).
  */
object Csv {

  /** Decided physical type of a CSV column (subset of the reference's
    * column kinds: `colInt | colFloat | colBool | colString`; `colObject`
    * collapses to string per SURVEY.md §7.5 risk 1). */
  sealed trait GuessedType
  case object GLong extends GuessedType
  case object GDouble extends GuessedType
  case object GBool extends GuessedType
  case object GString extends GuessedType

  private val IntRe = "^[+-]?[0-9]+$"
  private val InfRe = "^[+-]?(inf|infinity)$"
  // word digits "one".."nine" parse as ints in the reference (io.nim:323-330)
  private val WordDigits = Seq("one", "two", "three", "four", "five",
    "six", "seven", "eight", "nine")

  // stand-in separator after collapsing runs of spaces (space-separated
  // files with aligned columns, like the reference's parser handles)
  private val SpaceSep = "\u0001"

  /** Read a CSV file into a typed DataFrame with reference inference.
    *
    * `path` may also be an `http://` or `https://` URL (`io.nim:752-756`):
    * the content is fetched driver-side once, with no caching, exactly
    * like the reference's `readCsvFromUrl` (`io.nim:672-686`) — a
    * convenience for small remote files, not a distributed source. Other
    * schemes (`file://`, `hdfs://`, `s3a://`…) go to Spark's distributed
    * reader as plain paths. Like the reference's URL branch, the fetch
    * path does not support `allowLineBreaks` (content is pre-split on
    * physical lines).
    *
    * `colNames` overrides the header entirely: the data is treated as
    * headerless (combine with `skipLines` to discard a real header, like
    * the reference's tests do). `sep = " "` means "runs of whitespace"
    * (aligned fixed-width-ish files).
    *
    * @param skipLines drop N physical lines before the header (`io.nim:694`)
    * @param maxLines stop after N data lines, not counting skipLines or the
    *   header (`io.nim:723-724`); 0 = unlimited
    * @param toSkip optional characters removed anywhere in a line before
    *   parsing (`io.nim:709-713`, e.g. `Set(' ')` for `5, 10, 8`-style
    *   files). Divergence from the reference's char-level parser skip:
    *   removal also applies inside quoted fields.
    * @param headerSymbol reference `header: string` mode (`io.nim:714-718`):
    *   when nonempty, column names come from the first line (which must
    *   start with the symbol), and only the CONTIGUOUS run of
    *   symbol-prefixed lines after it (the preamble) is skipped — a later
    *   data row that happens to begin with the symbol is data, and the
    *   `comment` option keeps its own, independent meaning (it is not
    *   overridden by the symbol).
    * @param wordDigits replicate the reference's `parseStringDigit` quirk
    *   ("one".."nine" count and parse as ints, `io.nim:323-330`); off by
    *   default — it is a surprise in production data.
    * @param allowLineBreaks permit line breaks inside quoted fields
    *   (`io.nim:744-748`; Spark's `multiLine`). Requires the splittable
    *   whole-file path — incompatible with skipLines/maxLines/toSkip and
    *   whitespace sep, which pre-split on physical lines. Note multiLine
    *   files are not split across tasks (one task per file).
    */
  def readCsv(spark: SparkSession, path: String,
              sep: String = ",", header: Boolean = true,
              quote: String = "\"", comment: String = "#",
              skipLines: Int = 0, maxLines: Int = 0,
              toSkip: Set[Char] = Set.empty,
              colNames: Seq[String] = Nil,
              headerSymbol: String = "",
              wordDigits: Boolean = false,
              allowLineBreaks: Boolean = false): DataFrame = {
    if (headerSymbol.nonEmpty && colNames.isEmpty &&
        !path.startsWith("http://") && !path.startsWith("https://")) {
      require(!allowLineBreaks,
        "readCsv: allowLineBreaks is incompatible with headerSymbol " +
          "(the preamble skip is positional on physical lines)")
      // Names from the symbol-prefixed header line; skip ONLY the
      // contiguous preamble of symbol lines (io.nim readCsv doc: "skip
      // every line until the first line starting without the symbol").
      // The user's `comment` option is honored independently.
      val idx = spark.sparkContext.textFile(path).zipWithIndex()
      val first = idx.filter(_._2 == skipLines).map(_._1)
        .take(1).headOption.getOrElse("")
      require(first.startsWith(headerSymbol),
        s"readCsv: first line does not start with headerSymbol '$headerSymbol'")
      val names = splitHeader(first.stripPrefix(headerSymbol), sep)
      // first physical line at/after skipLines not starting with the symbol
      val firstData = idx
        .filter { case (l, i) => i >= skipLines && !l.startsWith(headerSymbol) }
        .map(_._2).fold(Long.MaxValue)(math.min)
      if (firstData == Long.MaxValue) // header + preamble only: empty table
        return finish(emptyStrings(spark, names.length), names, wordDigits)
      return readCsv(spark, path, sep, header = false, quote, comment,
        skipLines = firstData.toInt, maxLines, toSkip, colNames = names,
        headerSymbol = "", wordDigits = wordDigits, allowLineBreaks = false)
    }
    if (path.startsWith("http://") || path.startsWith("https://")) {
      require(!allowLineBreaks,
        "readCsv: allowLineBreaks is not supported with URL fetch " +
          "(content is pre-split on physical lines, like the reference)")
      return parseCsvString(spark, fetchUrl(path), sep, header, skipLines,
        maxLines, toSkip, colNames, wordDigits, quote, comment, headerSymbol)
    }
    val needLineSplit = skipLines > 0 || maxLines > 0 || toSkip.nonEmpty || sep == " "
    val raw =
      if (!needLineSplit) {
        val base = spark.read
          .option("sep", sep)
          .option("header", header && colNames.isEmpty)
          .option("quote", quote)
          .option("multiLine", allowLineBreaks)
          .option("ignoreLeadingWhiteSpace", "true")
          .option("ignoreTrailingWhiteSpace", "true")
          .option("inferSchema", "false")
        (if (comment.nonEmpty) base.option("comment", comment) else base).csv(path)
      } else {
        require(!allowLineBreaks,
          "readCsv: allowLineBreaks is incompatible with skipLines/maxLines/" +
            "toSkip/whitespace sep (those pre-split on physical lines)")
        // skipLines precedes the header (io.nim:694): drop the first N
        // physical lines, then parse the remainder. zipWithIndex gives
        // deterministic per-file line numbers (order-sensitive ingestion —
        // one of the rare legitimate RDD uses).
        import spark.implicits._
        val hasHeader = header && colNames.isEmpty
        var lines = spark.sparkContext.textFile(path)
          .zipWithIndex().filter(_._2 >= skipLines).map(_._1)
        if (toSkip.nonEmpty) lines = lines.map(_.filterNot(toSkip))
        if (maxLines > 0) {
          // cap counts DATA lines (io.nim:723-724): blank and comment
          // lines are dropped by the parse anyway, so drop them before
          // indexing — the cap then lands on header + N parsed rows
          val headerOffset = if (hasHeader) 1 else 0
          lines = lines
            .filter(l => l.nonEmpty && !(comment.nonEmpty && l.startsWith(comment)))
            .zipWithIndex().filter(_._2 < headerOffset + maxLines).map(_._1)
        }
        parseLines(spark, spark.createDataset(lines), sep, hasHeader, quote, comment)
      }
    finish(raw, colNames, wordDigits)
  }

  /** Driver-side URL fetch (`readCsvFromUrl`, `io.nim:672-686`): no
    * caching, whole content in memory — small files only, by design.
    * (`private[graft]` so the suite can exercise it via `file://` —
    * the environment has no egress for a real http round trip.) */
  private[graft] def fetchUrl(url: String): String = {
    val in = new java.net.URI(url).toURL.openStream()
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** CSV from an in-memory string (`parseCsvString`, `io.nim:623-668`). */
  def parseCsvString(spark: SparkSession, content: String,
                     sep: String = ",", header: Boolean = true,
                     skipLines: Int = 0, maxLines: Int = 0,
                     toSkip: Set[Char] = Set.empty,
                     colNames: Seq[String] = Nil,
                     wordDigits: Boolean = false,
                     quote: String = "\"",
                     comment: String = "#",
                     headerSymbol: String = ""): DataFrame = {
    import spark.implicits._
    if (headerSymbol.nonEmpty && colNames.isEmpty) {
      // contiguous-preamble skip only; user's `comment` stays in force
      val ls = content.split("\r?\n").toIndexedSeq.drop(skipLines)
      val first = ls.headOption.getOrElse("")
      require(first.startsWith(headerSymbol),
        s"parseCsvString: first line does not start with headerSymbol '$headerSymbol'")
      val names = splitHeader(first.stripPrefix(headerSymbol), sep)
      val data = ls.dropWhile(_.startsWith(headerSymbol))
      if (data.isEmpty)
        return finish(emptyStrings(spark, names.length), names, wordDigits)
      return parseCsvString(spark, data.mkString("\n"), sep, header = false,
        skipLines = 0, maxLines, toSkip, names, wordDigits, quote, comment,
        headerSymbol = "")
    }
    val hasHeader = header && colNames.isEmpty
    var lines = content.split("\r?\n").toIndexedSeq.drop(skipLines)
    if (toSkip.nonEmpty) lines = lines.map(_.filterNot(toSkip))
    if (maxLines > 0)
      // data-line cap, like readCsv: blanks/comments don't count
      lines = lines
        .filter(l => l.nonEmpty && !(comment.nonEmpty && l.startsWith(comment)))
        .take((if (hasHeader) 1 else 0) + maxLines)
    val raw = parseLines(spark, spark.createDataset(lines), sep,
      hasHeader, quote = quote, comment = comment)
    finish(raw, colNames, wordDigits)
  }

  private def parseLines(spark: SparkSession, lines: Dataset[String],
                         sep: String, header: Boolean,
                         quote: String, comment: String): DataFrame = {
    import spark.implicits._
    val (data, effSep) =
      if (sep == " ")
        (lines.filter(_.trim.nonEmpty).map(_.trim.replaceAll("\\s+", SpaceSep)), SpaceSep)
      else (lines.filter(_.nonEmpty), sep)
    val base = spark.read
      .option("sep", effSep)
      .option("header", header)
      .option("quote", quote)
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .option("inferSchema", "false")
    (if (comment.nonEmpty) base.option("comment", comment) else base).csv(data)
  }

  /** Zero-row all-string frame (headerSymbol files whose body is all
    * preamble: the header still names the columns). */
  private def emptyStrings(spark: SparkSession, n: Int): DataFrame = {
    val schema = StructType((0 until n).map(i =>
      StructField(s"_c$i", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private def finish(raw: DataFrame, colNames: Seq[String],
                     wordDigits: Boolean): DataFrame = {
    val named =
      if (colNames.nonEmpty) {
        require(colNames.length == raw.columns.length,
          s"readCsv: ${colNames.length} colNames for ${raw.columns.length} columns")
        raw.toDF(colNames: _*)
      } else
        raw.toDF(raw.columns.zipWithIndex.map { case (c, i) =>
          sanitizeName(c, i)
        }.toIndexedSeq: _*)
    inferTypes(named, wordDigits)
  }

  /** Tokenize a `headerSymbol` header line into column names. */
  private def splitHeader(s: String, sep: String): Seq[String] = {
    val toks =
      if (sep == " ") s.trim.split("\\s+")
      else s.split(java.util.regex.Pattern.quote(sep))
    toks.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Unnamed columns become `UnnamedN` like the reference (`io.nim:143-144`).
    * Only Spark's synthetic `_c<digits>` names count as unnamed — a user
    * header like `_cost` passes through untouched. */
  private def sanitizeName(c: String, i: Int): String =
    if (c == null || c.trim.isEmpty || c.matches("_c\\d+")) s"Unnamed$i" else c.trim

  /** One distributed pass voting each column's type, one typed projection.
    * All columns of `df` must be strings (the raw CSV parse). */
  def inferTypes(df: DataFrame, wordDigits: Boolean = false): DataFrame = {
    val cols = df.columns.toSeq
    val missing: String => org.apache.spark.sql.Column =
      c => col(c).isNull || col(c) === ""
    val isLongStr: String => org.apache.spark.sql.Column = { c =>
      val plain = col(c).rlike(IntRe) && expr(s"try_cast(`$c` as bigint)").isNotNull
      if (wordDigits) plain || lower(col(c)).isin(WordDigits: _*) else plain
    }
    val isDoubleStr: String => org.apache.spark.sql.Column =
      c => expr(s"try_cast(`$c` as double)").isNotNull ||
        lower(col(c)).rlike(InfRe) || lower(col(c)) === "nan"
    val isBoolStr: String => org.apache.spark.sql.Column =
      c => lower(col(c)).isin("true", "false")

    // per column: [nonMissing, long-parsable, double-parsable, bool, missing]
    // (sums coalesced: over ZERO rows sum() is NULL, and an empty frame —
    // e.g. a headerSymbol file whose body is all preamble — must still
    // type-infer to all-string instead of throwing)
    def cnt(c: org.apache.spark.sql.Column) = coalesce(sum(c), lit(0L))
    val voteCols = cols.map { c =>
      struct(
        cnt(when(!missing(c), 1L).otherwise(0L)).as("n"),
        cnt(when(!missing(c) && isLongStr(c), 1L).otherwise(0L)).as("nLong"),
        cnt(when(!missing(c) && isDoubleStr(c), 1L).otherwise(0L)).as("nDouble"),
        cnt(when(!missing(c) && isBoolStr(c), 1L).otherwise(0L)).as("nBool"),
        cnt(when(missing(c), 1L).otherwise(0L)).as("nMiss")).as(c)
    }
    val vote = df.agg(voteCols.head, voteCols.tail: _*).head()

    val guessed: Seq[(String, GuessedType)] = cols.zipWithIndex.map { case (c, i) =>
      val r = vote.getStruct(i)
      val (n, nLong, nDouble, nBool, nMiss) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val t =
        if (n == 0L) GString
        else if (nBool == n) GBool
        // int needs every cell integral AND no missing cells (missing in a
        // numeric column is NaN, which int can't hold -> promote to double)
        else if (nLong == n && nMiss == 0L) GLong
        else if (nDouble == n) GDouble
        else GString
      c -> t
    }

    val wordDigitMap: org.apache.spark.sql.Column =
      map(WordDigits.zipWithIndex.flatMap { case (w, i) =>
        Seq(lit(w), lit((i + 1).toLong))
      }: _*)

    df.select(guessed.map { case (c, t) =>
      val v = col(c)
      (t match {
        case GLong =>
          if (wordDigits) coalesce(expr(s"try_cast(`$c` as bigint)"),
            element_at(wordDigitMap, lower(v)))
          else v.cast(LongType)
        case GDouble =>
          when(v.isNull || v === "", lit(Double.NaN))
            .when(lower(v) === "nan", lit(Double.NaN))
            .when(lower(v).rlike("^\\+?(inf|infinity)$"), lit(Double.PositiveInfinity))
            .when(lower(v).rlike("^-(inf|infinity)$"), lit(Double.NegativeInfinity))
            .otherwise(v.cast(DoubleType))
        case GBool => lower(v) === "true"
        case GString => coalesce(v, lit("")) // colString has no null (value.nim:4-25)
      }).as(c)
    }: _*)
  }

  /** Table-of-string-seqs → typed DataFrame (`strTabToDf`,
    * `dataframe.nim:421-493`): builds the raw string frame driver-side
    * (it is a literal constructor, like toDf) and runs the same
    * inference/promotion vote as [[readCsv]]. */
  def strTabToDf(spark: SparkSession, tab: Seq[(String, Seq[String])],
                 wordDigits: Boolean = false): DataFrame = {
    require(tab.nonEmpty, "strTabToDf: at least one column required")
    val n = tab.head._2.length
    require(tab.forall(_._2.length == n), "strTabToDf: ragged columns")
    val schema = StructType(tab.map { case (name, _) =>
      StructField(name, StringType, nullable = true)
    })
    val rows = (0 until n).map(i => org.apache.spark.sql.Row.fromSeq(tab.map(_._2(i))))
    import scala.jdk.CollectionConverters._
    inferTypes(spark.createDataFrame(rows.asJava, schema), wordDigits)
  }

  /** Write as CSV (`writeCsv`, `io.nim:807-826`). Distributed: `path`
    * becomes a directory of part files — the cluster-scale shape. */
  def writeCsv(df: DataFrame, path: String, sep: String = ",",
               header: Boolean = true): Unit =
    df.write.mode("overwrite")
      .option("sep", sep).option("header", header)
      .option("emptyValue", "")
      .csv(path)

  /** Single-file CSV for the test kit / small exports (coalesce(1) — do
    * not use on large data). */
  def writeCsvSingle(df: DataFrame, path: String, sep: String = ",",
                     header: Boolean = true): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("sep", sep).option("header", header)
      .option("emptyValue", "")
      .csv(path)
}
