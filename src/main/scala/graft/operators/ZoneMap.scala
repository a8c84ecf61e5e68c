package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan,
  LessThanOrEqual, StringStartsWith}
import org.apache.spark.sql.types.{ByteType, DataType, DateType,
  IntegerType, LongType, ShortType, StructType}

import graft.functions.StrExtremaAgg.{str_max, str_min}

/** Persisted per-FILE zone maps — the lakehouse data-skipping layer
  * as an incrementally-maintained artifact under the [[IndexDirs]]
  * manifest discipline.
  *
  * Parquet footers already carry row-group min/max, but at 100 TB the
  * footer is the wrong altitude: skipping a file via its footer still
  * costs listing it, scheduling a task, and opening it. A zone map
  * moves the same min/max/null-count facts into ONE metadata-scale
  * side table (≤ |files|·|cols| rows), so a range or equality
  * predicate prunes the FILE LIST on the driver — pruned files are
  * never listed into the scan, never scheduled, never opened. This
  * is the Delta/Iceberg data-skipping idea re-expressed over plain
  * parquet directories; the driver-side file-list materialization is
  * the same altitude Spark's own `InMemoryFileIndex` already works
  * at, so collecting the surviving file names is bounded by what any
  * parquet scan of the table materializes anyway.
  *
  * Layout:
  * {{{
  *   <path>/stats/    parquet, ≤ |files|·|cols| rows: (file,
  *                    col_name, kind, n_rows, n_nulls, min_num,
  *                    max_num, min_str, max_str)
  *   <path>/deltas/d<N>/stats   newly-profiled files (refresh)
  *   manifest.m<K>.json — [[IndexDirs]] atomic versioned commits
  * }}}
  *
  * ALGEBRA — per-file rows are DISJOINT across deltas (a file is
  * profiled exactly once), so serve = base ∪ deltas with no fold;
  * [[refresh]] profiles only files NEW to the table directory
  * (O(new data)) and — unlike [[ColStats]]' monotone whole-table
  * profile — file REMOVALS retract exactly: dropping a vanished
  * file's stats rows removes precisely its contribution, so refresh
  * after a vacuum rewrites the (metadata-scale) stats table to the
  * survivors via a [[IndexDirs.claimBaseSuffix]]-claimed versioned
  * base. Numeric zone columns must be INTEGRAL types (long/int/
  * short/byte): a truncating cast would make `max_num` lie about
  * fractional values and a boundary predicate would prune a file
  * that still matches — refused at build instead.
  *
  * Pruning ([[prune]]/[[scan]]) is CONSERVATIVE: a file survives
  * unless the predicate provably matches none of its rows
  * (`EqualTo`/`In`/range ⇒ intersect [min,max] of NON-NULL values —
  * these predicates reject nulls, so an all-null file prunes;
  * `IsNull` ⇒ prune files with zero nulls; `IsNotNull` ⇒ prune
  * all-null files; `StringStartsWith`/LIKE-'p%' ⇒ intersect the
  * prefix's byte interval [p, nextPrefix(p))). String zone tests
  * compare UTF-8 BYTES — the order the extrema were aggregated under
  * — never Java's UTF-16 code-unit order, which disagrees above the
  * BMP. Unrecognized filters and undeclared columns keep
  * every file. Callers re-apply the predicate above the scan —
  * pruning is never trusted as exact ([[graft.sources.ZoneMapSource]]
  * reports every filter unhandled for the same reason).
  */
object ZoneMap {

  type Build = IndexBuild
  val Build = IndexBuild

  /** On-disk format version. 2 added the per-file BLOOM table
    * (`bloom/` — packed 64-bit words of a per-(file, col) bloom
    * filter over the rendered value), which skips files for
    * EQUALITY/IN predicates on columns whose values interleave
    * across files — exactly where min/max zones are useless.
    * 3 added the `files/` LEDGER (one row per profiled file: join
    * key, fully-qualified URI, length, mtime, written from the
    * driver's listing) — it closes three holes of deriving the file
    * set from stats rows: a ZERO-ROW parquet file produces no stats
    * rows (so refresh re-"added" it forever, drifting n), the
    * scheme-stripped join key is not a readable path on a
    * non-default filesystem (scans now read the ledger's URIs), and
    * a same-length in-place rewrite was invisible to the length-only
    * pin (the ledger carries mtime).
    * 4 added per-file CONTENT-FINGERPRINT partials to the ledger
    * (`cfp`/`cn`: xor of per-row xxhash64 over the declared columns
    * plus the row count, computed in the same profiling scan) — what
    * lets a consumer verifying "base content == sibling artifact"
    * ([[graft.plans.ColStatsInjection.refreshPins]]) COMPOSE stored
    * partials for unchanged files and fingerprint only new ones
    * (O(delta) instead of a projected corpus scan per refresh).
    * `sameIndexAs` includes fmt, so older artifacts rebuild.
    */
  private val Fmt = 4

  private case class Manifest(fp: Long, n: Long, tableDir: String,
      numCols: Seq[String], strCols: Seq[String],
      bloomCols: Seq[String] = Nil, bloomBits: Int = 8192,
      bloomK: Int = 3, deltas: Seq[String] = Nil, baseVer: Int = 0,
      fmt: Int = Fmt, mv: Long = 0L) {
    def sameIndexAs(other: Manifest): Boolean =
      copy(deltas = Nil, baseVer = 0, mv = 0L) ==
        other.copy(deltas = Nil, baseVer = 0, mv = 0L)
  }

  private def toManifest(r: IndexDirs.ManifestReader): Manifest = {
    val fmt = r.intOr("fmt", 1)
    Manifest(r.long("fp"), r.long("n"), r.str("table"),
      r.seq("num"), r.seq("str"),
      if (fmt >= 2) r.seq("bloom") else Nil,
      if (fmt >= 2) r.int("bloomm") else 8192,
      if (fmt >= 2) r.int("bloomk") else 3,
      r.seq("deltas"), r.intOr("bv", 0), fmt, mv = r.version)
  }

  private def readManifest(path: String): Option[Manifest] =
    IndexDirs.readManifest(path).map(toManifest)

  private def writeManifest(path: String, mf: Manifest): Unit =
    IndexDirs.manifest()
      .put("fp", mf.fp).put("n", mf.n).put("table", mf.tableDir)
      .put("num", mf.numCols).put("str", mf.strCols)
      .put("bloom", mf.bloomCols).put("bloomm", mf.bloomBits)
      .put("bloomk", mf.bloomK).put("fmt", mf.fmt)
      .put("bv", mf.baseVer).put("deltas", mf.deltas)
      .commit(path, mf.mv)

  /** One listed data file: `key` is the scheme-free path
    * `input_file_name()` rows join on, `uri` the fully-qualified
    * path a scan READS (the two differ on any non-default
    * filesystem), plus the (length, mtime) immutability pin.
    */
  final case class FileEnt(key: String, uri: String, len: Long,
      mtime: Long)

  /** The file-list fingerprint the reuse check anchors on: xor-fold
    * over (name, length, mtime) of the table's data files —
    * metadata-only, never a data scan. Length AND mtime are in the
    * key so an in-place overwrite of a same-named file — even to the
    * same byte length — reads as a different table.
    */
  private[operators] def listFingerprint(files: Seq[FileEnt]): (Long, Long) = {
    val fp = files.map { f =>
      scala.util.hashing.MurmurHash3
        .stringHash(s"${f.key}#${f.len}#${f.mtime}").toLong
    }.foldLeft(0L)(_ ^ _)
    (fp, files.size.toLong)
  }

  /** The scheme-and-authority-free path `input_file_name()` rows are
    * keyed by — one normalization shared by the driver-side listing
    * ([[listDataFiles]] uses `URI.getPath`) and the executor-side
    * column ([[fileKey]]), so the two sides always agree.
    */
  private[operators] def fileKey(c: Column): Column =
    regexp_replace(
      regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""),
      "^[a-zA-Z][a-zA-Z0-9+.-]*:", "")

  /** The table directory's current data files — one driver-side
    * recursive listing, the same listing any scan of the table
    * performs. Each entry carries both the scheme-free join key and
    * the qualified URI ([[FileEnt]]).
    */
  def listDataFiles(tableDir: String): Seq[FileEnt] = {
    val f = IndexDirs.fs(tableDir)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    if (!f.exists(root)) return Nil
    val it = f.listFiles(root, true)
    val out = Seq.newBuilder[FileEnt]
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      if (s.isFile && !name.startsWith("_") && !name.startsWith(".") &&
          name.endsWith(".parquet"))
        out += FileEnt(s.getPath.toUri.getPath, s.getPath.toString,
          s.getLen, s.getModificationTime)
    }
    out.result().sortBy(_.key)
  }

  private def integral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** Default rows-per-output-file for the artifact tables. The zone
    * tables are metadata-scale but GROW WITH |files|: at 10⁶ base
    * files × 40 columns the stats table is 4·10⁷ rows — `coalesce(1)`
    * would funnel the whole build through one reducer and write one
    * giant file. Above this bound the writers hash-distribute on
    * `file` (per-file rows stay co-located, so file-keyed reads and
    * the killed-set subtraction are unaffected); at or below it they
    * keep the single-file layout small artifacts want.
    */
  val DefaultArtifactRowsPerFile: Long = 1L << 22

  /** Write one artifact table sized by its own (driver-estimable)
    * row bound — 1 file below `rowsPerFile`, hash-bucketed on `file`
    * above it (≤ 256 output files).
    */
  private[operators] def writeArtifact(df: DataFrame, estRows: Long,
      target: String, rowsPerFile: Long): Unit = {
    require(rowsPerFile >= 1, s"rowsPerFile must be >= 1: $rowsPerFile")
    val parts = math.max(1L, math.min(256L,
      (estRows + rowsPerFile - 1) / rowsPerFile)).toInt
    val out =
      if (parts == 1) df.coalesce(1)
      else df.repartition(parts, col("file"))
    out.write.mode("overwrite").parquet(target)
  }

  /** Per-file per-column profile of exactly `files`: ONE scan of
    * those files — stats, the fingerprint ledger AND the per-file
    * bloom words all explode from the same grain-tagged stream
    * ([[Profile.fusedAggregate]]'s shape; it used to be a second
    * whole-corpus scan for the blooms — guide §1.2/§2.4, remove
    * passes first), map-side combined to ≤ |files| × (|cols| + 1 +
    * bloom words) rows, checkpointed, and the three artifact tables
    * written CONCURRENTLY (guide §2.6). Each stats row carries the
    * file's LENGTH (`flen`, joined from the driver's listing), so
    * [[refresh]] can tell an in-place rewrite of one file apart from
    * unrelated adds/removes instead of trusting the aggregate
    * fingerprint.
    */
  private def profile(spark: SparkSession, mf: Manifest,
      files: Seq[FileEnt], outDir: String,
      rowsPerFile: Long = DefaultArtifactRowsPerFile): Unit = {
    import spark.implicits._
    val lens = files.map(f => (f.key, f.len)).toDF("file", "flen")
    val df = spark.read.parquet(files.map(_.uri): _*)
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    mf.numCols.foreach { c =>
      val dt = byName.getOrElse(c, throw new IllegalArgumentException(
        s"zone column $c missing from ${mf.tableDir}"))
      require(integral(dt) || dt == DateType,
        s"zone column $c is $dt: numeric zone maps require an " +
          "integral or date type (a truncating cast would prune " +
          "files whose fractional values still match a boundary " +
          "predicate) — declare it as a string zone or pre-scale to " +
          "integers")
    }
    // a DATE zone column stores days-since-epoch — the same long the
    // shared zone test ([[ZoneTests.asLong]]) converts a date filter
    // value to, so date-range file skipping works out of the box
    def numValue(c: String): Column = byName(c) match {
      case DateType => unix_date(col(c)).cast("long")
      case _ => col(c).cast("long")
    }
    def st(name: String, kind: String, bucket: Column, vnum: Column,
        vstr: Column): Column =
      struct(lit(name).as("col_name"), lit(kind).as("kind"),
        bucket.cast("long").as("bucket"), vnum.cast("long").as("vnum"),
        vstr.cast("string").as("vstr"))
    val nullL = lit(null).cast("long")
    val nullS = lit(null).cast("string")
    val pieces =
      mf.numCols.map(c =>
        st(c, "num", lit(0L), numValue(c), nullS)) ++
      mf.strCols.map(c =>
        st(c, "str", lit(0L), nullL, col(c).cast("string"))) ++
      // per-(file, col) bloom pieces, one per hash seed: vnum carries
      // the bit POSITION (the exact hash [[bloomPositions]] replays:
      // xxhash64 over "<rendered>:<seed>", position mod bloomBits),
      // bucket the packed 64-bit word index
      mf.bloomCols.flatMap { c =>
        (0 until mf.bloomK).map { seed =>
          val r = col(c).cast("string")
          val pos = pmod(xxhash64(concat(r, lit(s":$seed"))),
            lit(mf.bloomBits.toLong)).cast("int")
          st(c, "bl", (pos / 64).cast("int"), pos, r)
        }
      } :+
      // the per-file content-fingerprint piece (format 4): the row's
      // xxhash64 over ALL declared columns — the same expression
      // IndexDirs.contentFingerprint hashes, so the per-file xor
      // partials compose to exactly what a consumer's projected
      // fingerprint pass would compute. vstr = "x": never counted
      // as a null by the n_nulls expression below.
      st("", "fp", lit(0L),
        xxhash64((mf.numCols ++ mf.strCols).map(col): _*), lit("x"))
    // ONE scan feeds stats, blooms AND the ledger fingerprints: the
    // grouped aggregate is metadata-scale (≤ |files|·(|cols| + 1 +
    // bloom words) rows), so checkpointing it is cheap where a second
    // corpus scan is not. The file key is projected BEFORE Par.widen
    // (input_file_name() is only valid in the scan's own stage); the
    // widen parallelizes the explosion when the scan has fewer splits
    // than cores and is the identity at corpus scale.
    val needed = (mf.numCols ++ mf.strCols ++ mf.bloomCols).distinct
    val agg = Par.widen(df
        .select(fileKey(input_file_name()).as("file") +:
          needed.map(col): _*))
      .select(col("file"), explode(array(pieces: _*)).as("e"))
      .select(col("file"), col("e.*"))
      // a null rendered value sets no bloom bits (the old separate
      // bloom pass's own filter)
      .filter(!(col("kind") === "bl" && col("vstr").isNull))
      // Column-valued shift amount: the shiftleft() helper only
      // takes a literal Int, the SQL form takes an expression
      .withColumn("bit", when(col("kind") === "bl",
        expr("shiftleft(1L, int(pmod(vnum, 64)))")))
      .groupBy("file", "col_name", "kind", "bucket")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("vnum").isNull && col("vstr").isNull, 1L)
          .otherwise(0L)).as("n_nulls"),
        min("vnum").as("min_num"), max("vnum").as("max_num"),
        // exact string extrema on (Object)HashAggregate — built-in
        // string min/max would downgrade this corpus-scale pass to
        // SortAggregate (see graft.functions.StrExtremaAgg)
        str_min(when(col("kind") =!= "bl", col("vstr"))).as("min_str"),
        str_max(when(col("kind") =!= "bl", col("vstr"))).as("max_str"),
        bit_xor(when(col("kind") === "fp", col("vnum"))).as("xorv"),
        bit_or(col("bit")).as("orbits"))
      .localCheckpoint()
    // the driver-side ledger: COMPLETE over the profiled files (a
    // zero-row file contributes no stats rows — it gets the (0, 0)
    // fingerprint identity), the only place the READABLE uri is
    // kept, and (format 4) the per-file fingerprint partials.
    // Collected first; the three artifact tables then write
    // CONCURRENTLY off the checkpointed aggregate (guide §2.6).
    val fpByFile: Map[String, (Long, Long)] =
      agg.filter(col("kind") === "fp")
        .select(col("file"), col("xorv"), col("n_rows")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    val writeStats = () => writeArtifact(
      agg.filter(col("kind") === "num" || col("kind") === "str")
        .select(col("file"), col("col_name"), col("kind"),
          col("n_rows"), col("n_nulls"), col("min_num"),
          col("max_num"), col("min_str"), col("max_str"))
        .join(broadcast(lens), Seq("file")),
      files.size.toLong * (mf.numCols.size + mf.strCols.size),
      s"$outDir/stats", rowsPerFile)
    val writeFiles = () => writeArtifact(
      files.map { f =>
        val (cfp, cn) = fpByFile.getOrElse(f.key, (0L, 0L))
        (f.key, f.uri, f.len, f.mtime, cfp, cn)
      }.toDF("file", "uri", "flen", "fmtime", "cfp", "cn"),
      files.size.toLong, s"$outDir/files", rowsPerFile)
    // per-(file, col) bloom filter over the RENDERED value, packed
    // into ≤ bloomBits/64 64-bit words per pair (the bl grain of the
    // one fused aggregate — rows stay metadata-scale at any corpus
    // size)
    val writeBloom = () => {
      val bloomRows =
        if (mf.bloomCols.isEmpty)
          // keep the table present (reads union it unconditionally)
          agg.limit(0).select(lit("").as("file"),
            lit("").as("col_name"), lit(0).as("word"),
            lit(0L).as("bits"))
        else
          agg.filter(col("kind") === "bl")
            .select(col("file"), col("col_name"),
              col("bucket").cast("int").as("word"),
              col("orbits").as("bits"))
      writeArtifact(bloomRows,
        files.size.toLong * mf.bloomCols.size * (mf.bloomBits / 64),
        s"$outDir/bloom", rowsPerFile)
    }
    Par.inParallel(Seq(writeStats, writeFiles, writeBloom))
  }

  /** The k bloom bit positions of a RENDERED value — the driver-side
    * twin of the plan-side hash in [[profile]] (same xxhash64 over
    * `"<rendered>:<seed>"`, same default seed 42), via the same
    * engine function so the bits can never drift.
    */
  private def bloomPositions(rendered: String, m: Int,
      k: Int): Seq[Int] = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    (0 until k).map { seed =>
      val h = XxHash64Function.hash(
        UTF8String.fromString(s"$rendered:$seed"), StringType, 42L)
      val p = (h % m).toInt
      if (p < 0) p + m else p
    }
  }

  private def baseOf(mf: Manifest): String =
    if (mf.baseVer == 0) "stats" else s"stats.v${mf.baseVer}"

  private def liveStats(spark: SparkSession, path: String,
      mf: Manifest): DataFrame =
    (s"$path/${baseOf(mf)}" +:
      mf.deltas.map(d => s"$path/deltas/$d/stats"))
      .map(spark.read.parquet(_)).reduce(_.unionByName(_))

  /** Bloom rows ride a sibling base dir versioned in lockstep with
    * the stats base (`bloom` / `bloom.vK` beside `stats` /
    * `stats.vK` — one claimed suffix covers both).
    */
  private def bloomBaseOf(mf: Manifest): String =
    if (mf.baseVer == 0) "bloom" else s"bloom.v${mf.baseVer}"

  private def liveBloom(spark: SparkSession, path: String,
      mf: Manifest): DataFrame =
    (s"$path/${bloomBaseOf(mf)}" +:
      mf.deltas.map(d => s"$path/deltas/$d/bloom"))
      .map(spark.read.parquet(_)).reduce(_.unionByName(_))

  /** The files ledger bases ride the same claimed version suffix as
    * the stats bases.
    */
  private def filesBaseOf(mf: Manifest): String =
    if (mf.baseVer == 0) "files" else s"files.v${mf.baseVer}"

  /** The live file LEDGER (key, uri, flen, fmtime) — base ∪ deltas,
    * one row per profiled file, COMPLETE even for zero-row files. A
    * pre-format-3 artifact has no ledger; it derives the old
    * (key-only, length-only, key-as-uri) view from its stats rows,
    * keeping reads working until the next rebuild.
    */
  private def liveLedger(spark: SparkSession, path: String,
      mf: Manifest): DataFrame =
    if (mf.fmt >= 3)
      (s"$path/${filesBaseOf(mf)}" +:
        mf.deltas.map(d => s"$path/deltas/$d/files"))
        .map(spark.read.parquet(_)).reduce(_.unionByName(_))
    else
      liveStats(spark, path, mf)
        .select(col("file"), col("file").as("uri"), col("flen"),
          lit(0L).as("fmtime"))
        .distinct()

  private def liveLedgerEnts(spark: SparkSession, path: String,
      mf: Manifest): Seq[FileEnt] =
    // by-name select: the format-4 ledger carries fingerprint
    // columns after these four
    liveLedger(spark, path, mf)
      .select("file", "uri", "flen", "fmtime").collect()
      .map(r => FileEnt(r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
      .sortBy(_.key).toIndexedSeq

  private def liveFiles(spark: SparkSession, path: String,
      mf: Manifest): Seq[String] =
    liveLedgerEnts(spark, path, mf).map(_.key)

  /** `bloomCols` (optional): columns that ALSO get a per-file bloom
    * filter over the rendered value — equality/IN predicates then
    * skip files whose filter provably lacks the probe, which works
    * even when the column's values interleave across every file and
    * min/max zones keep everything. `bloomBits`/`bloomK` size the
    * filter (defaults: 8192 bits = 128 packed words per file × col,
    * 3 hashes — ~1% false-keep at 1k distinct values per file).
    */
  def buildIfAbsent(spark: SparkSession, tableDir: String,
      numCols: Seq[String], strCols: Seq[String],
      path: String, bloomCols: Seq[String] = Nil,
      bloomBits: Int = 8192, bloomK: Int = 3,
      artifactRowsPerFile: Long = DefaultArtifactRowsPerFile)
      : Build = {
    require((numCols ++ strCols).nonEmpty, "declare at least 1 column")
    require(numCols.intersect(strCols).isEmpty,
      s"columns declared both num and str: " +
        numCols.intersect(strCols).mkString(","))
    require(bloomBits >= 64 && bloomBits % 64 == 0,
      s"bloomBits must be a positive multiple of 64, got $bloomBits")
    require(bloomK >= 1, s"bloomK must be >= 1, got $bloomK")
    val files = listDataFiles(tableDir)
    require(files.nonEmpty, s"no parquet data files under $tableDir")
    val (fp, n) = listFingerprint(files)
    val want = Manifest(fp, n, tableDir, numCols, strCols,
      bloomCols, bloomBits, bloomK)
    readManifest(path) match {
      case Some(have) if have.sameIndexAs(want) =>
        Build(path, fp, n, reused = true)
      case _ =>
        IndexDirs.uncommit(path)
        profile(spark, want, files, path, artifactRowsPerFile)
        writeManifest(path, want)
        Build(path, fp, n, reused = false)
    }
  }

  /** Fused-builder hooks ([[Profile.buildBoth]]): the reuse check and
    * the manifest commit for a build whose TABLES the fused one-scan
    * pass wrote (the fused pass calls [[IndexDirs.uncommit]] before
    * writing, so commit order matches [[buildIfAbsent]]'s).
    */
  private[operators] def reusableFor(path: String, fp: Long, n: Long,
      tableDir: String, numCols: Seq[String], strCols: Seq[String],
      bloomCols: Seq[String], bloomBits: Int, bloomK: Int): Boolean =
    readManifest(path).exists(_.sameIndexAs(Manifest(fp, n, tableDir,
      numCols, strCols, bloomCols, bloomBits, bloomK)))

  private[operators] def commitBuild(path: String, fp: Long, n: Long,
      tableDir: String, numCols: Seq[String], strCols: Seq[String],
      bloomCols: Seq[String], bloomBits: Int, bloomK: Int): Unit =
    writeManifest(path, Manifest(fp, n, tableDir, numCols, strCols,
      bloomCols, bloomBits, bloomK))

  /** Re-sync with the table directory. New files are profiled alone
    * (O(new data)) and committed as a delta; vanished files retract
    * by REWRITING the metadata-scale stats table to the survivors
    * (a claimed versioned base — two racing refreshes write disjoint
    * targets and the manifest race picks one). No change ⇒ no-op.
    */
  def refresh(spark: SparkSession, path: String,
      artifactRowsPerFile: Long = DefaultArtifactRowsPerFile)
      : Build = {
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no zone map at $path"))
    require(decl.fmt >= 4,
      s"zone map at $path was written by format ${decl.fmt}; " +
        "refresh needs the format-4 files ledger (per-file pins + " +
        "fingerprint partials) — rebuild with buildIfAbsent to " +
        "upgrade (reads still work meanwhile)")
    val now = listDataFiles(decl.tableDir)
    val (fp, n) = listFingerprint(now)
    if (fp == decl.fp && n == decl.n)
      return Build(path, decl.fp, decl.n, reused = true)
    // per-file (length, mtime) from the LEDGER (complete even for
    // zero-row files): an in-place rewrite is detected PER FILE — at
    // the same byte length too — so it can't hide behind unrelated
    // adds/removes the way an aggregate-fingerprint check would let it
    val profiled = liveLedgerEnts(spark, path, decl)
      .map(e => e.key -> e).toMap
    val nowMap = now.map(e => e.key -> e).toMap
    val changed = profiled.keysIterator.filter { f =>
      nowMap.get(f).exists(e =>
        e.len != profiled(f).len ||
          (profiled(f).mtime != 0L && e.mtime != profiled(f).mtime))
    }.toSeq
    if (changed.nonEmpty)
      // changed under an existing name (in-place overwrite): the
      // profile is stale in a way the delta algebra can't patch
      throw new IllegalStateException(
        s"table files changed in place under ${decl.tableDir} " +
          s"(${changed.sorted.take(3).mkString(", ")}…) — zone maps " +
          "track immutable files; rebuild with buildIfAbsent after " +
          "an in-place rewrite")
    val added = now.filterNot(e => profiled.contains(e.key))
    val removed = (profiled.keySet -- nowMap.keySet).toSeq.sorted
    if (removed.isEmpty) {
      // append-only growth: profile the new files, commit a delta
      val staged = IndexDirs.nextDeltaName(path, "d")
      profile(spark, decl, added, s"$path/deltas/$staged",
        artifactRowsPerFile)
      IndexDirs.stagedCommit(readManifest(path),
        writeManifest(path, _: Manifest), path, Seq(staged)) { have =>
        // a racing refresh that already profiled any of these files
        // makes this staging redundant — recheck per attempt
        val haveFiles = liveFiles(spark, path, have).toSet
        if (added.exists(a => haveFiles(a.key))) None
        else Some(have.copy(fp = have.fp ^ (fp ^ decl.fp),
          n = have.n + added.size, deltas = have.deltas :+ staged))
      } match {
        case Some(next) => Build(path, next.fp, next.n, reused = false)
        case None =>
          val cur = readManifest(path).getOrElse(decl)
          Build(path, cur.fp, cur.n, reused = true)
      }
    } else {
      // retraction: per-file rows are exact, so the survivors-only
      // rewrite IS the correct artifact; genuinely-new files profile
      // in the same pass
      val ver = IndexDirs.claimBaseSuffix(path, "stats.v",
        decl.baseVer + 1)
      val target = s"$path/stats.v$ver"
      val bloomTarget = s"$path/bloom.v$ver" // same claimed suffix
      val filesTarget = s"$path/files.v$ver"
      val stagedNew = s"$path/stats.v$ver.new"
      if (added.nonEmpty)
        profile(spark, decl, added, stagedNew, artifactRowsPerFile)
      def withNew(survivorTable: DataFrame, sub: String): DataFrame =
        if (added.isEmpty) survivorTable
        else survivorTable.unionByName(
          spark.read.parquet(s"$stagedNew/$sub"))
      val nSurvive = n // post-refresh file count, known driver-side
      val nCols = (decl.numCols.size + decl.strCols.size).toLong
      writeArtifact(withNew(liveStats(spark, path, decl)
          .filter(!col("file").isin(removed: _*)), "stats"),
        nSurvive * nCols, target, artifactRowsPerFile)
      writeArtifact(withNew(liveBloom(spark, path, decl)
          .filter(!col("file").isin(removed: _*)), "bloom"),
        nSurvive * decl.bloomCols.size * (decl.bloomBits / 64),
        bloomTarget, artifactRowsPerFile)
      writeArtifact(withNew(liveLedger(spark, path, decl)
          .filter(!col("file").isin(removed: _*)), "files"),
        nSurvive, filesTarget, artifactRowsPerFile)
      val folded = decl.deltas
      IndexDirs.commitWithRetry(readManifest(path),
        writeManifest(path, _: Manifest), path) { have =>
        // the rewrite folded decl's exact base+delta view; any commit
        // since (new delta, new base) makes it stale — refuse
        if (have.baseVer != decl.baseVer ||
            have.deltas != decl.deltas) None
        else Some(have.copy(fp = fp, n = n, baseVer = ver,
          deltas = Nil))
      } match {
        case Some(next) =>
          IndexDirs.gcDeltas(path, folded)
          IndexDirs.rmTree(stagedNew)
          // the replaced base generation is unreferenced by the live
          // manifest — GC it eagerly (the AggView treatment; nothing
          // ever stages INTO an old base, so this races no writer)
          IndexDirs.rmTree(s"$path/${baseOf(decl)}")
          IndexDirs.rmTree(s"$path/${bloomBaseOf(decl)}")
          IndexDirs.rmTree(s"$path/${filesBaseOf(decl)}")
          Build(path, next.fp, next.n, reused = false)
        case None =>
          IndexDirs.rmTree(target)
          IndexDirs.rmTree(bloomTarget)
          IndexDirs.rmTree(filesTarget)
          IndexDirs.rmTree(stagedNew)
          val cur = readManifest(path).getOrElse(decl)
          Build(path, cur.fp, cur.n, reused = true)
      }
    }
  }

  /** Fold the committed refresh deltas into ONE delta dir — same
    * serve state, fewer directories to union per read. Per-file rows
    * are disjoint across deltas, so the fold is a pure move (union,
    * no arithmetic). Returns the number of deltas folded; a racing
    * compaction that already folded any of them makes this one stale
    * (skips, GC's its staging).
    */
  def compactDeltas(spark: SparkSession, path: String,
      artifactRowsPerFile: Long = DefaultArtifactRowsPerFile): Int = {
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no zone map at $path"))
    if (decl.fmt < 3 || decl.deltas.length < 2) return 0
    val folded = decl.deltas
    val staged = IndexDirs.nextDeltaName(path, "c")
    val nCols = (decl.numCols.size + decl.strCols.size).toLong
    val est = Map("stats" -> decl.n * nCols,
      "bloom" -> decl.n * decl.bloomCols.size * (decl.bloomBits / 64),
      "files" -> decl.n)
    for (sub <- Seq("stats", "bloom", "files"))
      writeArtifact(
        folded.map(d => spark.read.parquet(s"$path/deltas/$d/$sub"))
          .reduce(_.unionByName(_)),
        est(sub), s"$path/deltas/$staged/$sub", artifactRowsPerFile)
    IndexDirs.stagedCommit(readManifest(path),
      writeManifest(path, _: Manifest), path, Seq(staged)) { have =>
      if (!folded.forall(have.deltas.contains)) None
      else Some(have.copy(
        deltas = staged +: have.deltas.filterNot(folded.toSet)))
    } match {
      case Some(_) => IndexDirs.gcDeltas(path, folded); folded.length
      case None => 0
    }
  }

  /** The artifact's on-disk format version, if one is built —
    * integrators gate format-dependent maintenance on it
    * ([[MergeOnRead.compact]] skips the auto-refresh of a
    * pre-format-3 map instead of failing a committed compaction).
    */
  def format(path: String): Option[Int] =
    readManifest(path).map(_.fmt)

  /** The committed manifest VERSION of the artifact — every
    * build/refresh/compact commit is a higher version, so this is
    * the freshness pin a consumer ([[graft.plans.ZoneMapScan]])
    * re-checks before trusting killed-set subtraction it verified
    * against an earlier state of the artifact.
    */
  def version(path: String): Long =
    readManifest(path).getOrElse(
      throw new IllegalStateException(s"no zone map at $path")).mv

  /** The artifact's committed declaration + freshness pins, as a
    * value: what a consumer pins at registration and compares
    * whole-sale before trusting the artifact again. The manifest
    * VERSION alone is not enough — a REBUILD ([[buildIfAbsent]] over
    * a changed declaration) uncommits and restarts the version
    * sequence, so the rebuilt artifact can land on the very version
    * number that was pinned; the declaration fields (cols, bloom
    * shape, fmt, listing fingerprint, delta chain) distinguish it.
    * Two equal Decls imply the same artifact CONTENT: a build is a
    * deterministic function of (declaration, file set), and the
    * listing fingerprint pins the file set by (name, length, mtime).
    */
  final case class Decl(tableDir: String, numCols: Seq[String],
      strCols: Seq[String], bloomCols: Seq[String], bloomBits: Int,
      bloomK: Int, fmt: Int, version: Long, fp: Long, n: Long,
      baseVer: Int, deltas: Seq[String])

  def declaration(path: String): Decl = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no zone map at $path"))
    Decl(mf.tableDir, mf.numCols, mf.strCols, mf.bloomCols,
      mf.bloomBits, mf.bloomK, mf.fmt, mf.mv, mf.fp, mf.n,
      mf.baseVer, mf.deltas)
  }

  /** The live per-file stats table — base ∪ deltas, rows disjoint
    * by (file, col_name), no fold needed.
    */
  def stats(spark: SparkSession, path: String): DataFrame = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no zone map at $path"))
    liveStats(spark, path, mf)
  }

  /** Every file the zone map has profiled (scheme-free paths) — the
    * complement of [[prune]]'s survivors is the killed set, which
    * integrators ([[MergeOnRead.readWhere]]) subtract from their own
    * manifest-selected file list so a LAGGING zone map can only keep
    * extra files, never drop unprofiled ones.
    */
  def profiledFiles(spark: SparkSession, path: String): Seq[String] = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no zone map at $path"))
    liveFiles(spark, path, mf)
  }

  /** The table's full schema (for empty-survivor scans and the SQL
    * source), read from one footer.
    */
  def tableSchema(spark: SparkSession, path: String): StructType = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no zone map at $path"))
    spark.read.parquet(mf.tableDir).schema
  }

  /** Can the file described by one stats row contain a row matching
    * `f`? Delegates to the shared conservative test ([[ZoneTests]] —
    * one definition for this per-FILE pruner and the MV rewrite's
    * per-kb pruner, so prefix/range/null/byte-order semantics never
    * drift).
    */
  private def mayMatch(f: Filter, kind: String, nRows: Long,
      nNulls: Long, minN: Option[Long], maxN: Option[Long],
      minS: Option[String], maxS: Option[String]): Boolean =
    ZoneTests.mayMatch(f, ZoneTests.Zone(kind, nRows, nNulls,
      minN, maxN, minS, maxS))

  private def colOf(f: Filter): Option[String] = ZoneTests.colOf(f)

  /** The file list a conjunction of `filters` cannot rule out, plus
    * the total profiled count: (surviving files, total files). The
    * stats scan evaluates distributed; only FILE NAMES collect —
    * the same driver-side materialization any scan's file index
    * performs.
    */
  def prune(spark: SparkSession, path: String,
      filters: Seq[Filter]): (Seq[String], Long) = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no zone map at $path"))
    pruneWith(spark, path, mf, liveLedgerEnts(spark, path, mf),
      filters)
  }

  /** [[prune]] against an ALREADY-READ manifest + ledger snapshot —
    * [[scan]] passes its own, so one scan works one consistent
    * artifact version (and pays one manifest/ledger read, not two).
    */
  private def pruneWith(spark: SparkSession, path: String,
      mf: Manifest, ents: Seq[FileEnt],
      filters: Seq[Filter]): (Seq[String], Long) = {
    val all = ents.map(_.key)
    val declared = (mf.numCols ++ mf.strCols).toSet
    val byCol = filters
      .flatMap(f => colOf(f).filter(declared).map(_ -> f))
      .groupBy(_._1).map { case (c, fs) => c -> fs.map(_._2) }
    def render(v: Any): Option[String] = v match {
      case s: String => Some(s)
      case l: java.lang.Long => Some(l.toString)
      case i: java.lang.Integer => Some(i.toString)
      case s: java.lang.Short => Some(s.toString)
      case b: java.lang.Byte => Some(b.toString)
      case _ => None
    }
    // bloom-testable conjuncts: each is (col, value-position-sets) —
    // a file passes the conjunct if ANY value set has ALL bits set
    // (EqualTo = one set; In = one per element). A literal that
    // doesn't render stays conservative: the whole filter is skipped.
    val bloomDecl = mf.bloomCols.toSet
    val bloomTests: Seq[(String, Seq[Seq[Int]])] = filters.flatMap {
      case EqualTo(a, v) if bloomDecl(a) =>
        render(v).map(r => a ->
          Seq(bloomPositions(r, mf.bloomBits, mf.bloomK)))
      case In(a, vs) if bloomDecl(a) && vs.nonEmpty =>
        val rs = vs.toSeq.map(render)
        if (rs.exists(_.isEmpty)) None
        else Some(a -> rs.flatten
          .map(bloomPositions(_, mf.bloomBits, mf.bloomK)))
      case _ => None
    }
    if (byCol.isEmpty && bloomTests.isEmpty)
      return (all, all.length.toLong)
    val zoneKilled = if (byCol.isEmpty) Set.empty[String] else {
      val rows = liveStats(spark, path, mf)
        .filter(col("col_name").isin(byCol.keys.toSeq: _*))
        .collect()
      rows.iterator.flatMap { r =>
        val c = r.getString(r.fieldIndex("col_name"))
        val kind = r.getString(r.fieldIndex("kind"))
        def optL(i: Int) =
          if (r.isNullAt(i)) None else Some(r.getLong(i))
        def optS(i: Int) =
          if (r.isNullAt(i)) None else Some(r.getString(i))
        val survivesAll = byCol(c).forall(f =>
          mayMatch(f, kind, r.getLong(r.fieldIndex("n_rows")),
            r.getLong(r.fieldIndex("n_nulls")),
            optL(r.fieldIndex("min_num")),
            optL(r.fieldIndex("max_num")),
            optS(r.fieldIndex("min_str")),
            optS(r.fieldIndex("max_str"))))
        if (survivesAll) None
        else Some(r.getString(r.fieldIndex("file")))
      }.toSet
    }
    val bloomKilled = if (bloomTests.isEmpty) Set.empty[String] else {
      // read ONLY the probed words: ≤ files × Σ(k·|values|) rows
      // collect — probe-scale, never the full bloom table
      val need = bloomTests
        .flatMap { case (c, sets) => sets.flatten.map(p => (c, p / 64)) }
        .distinct.groupBy(_._1).map { case (c, ws) => c -> ws.map(_._2) }
      val wordPred = need.map { case (c, ws) =>
        col("col_name") === c && col("word").isin(ws: _*)
      }.reduce(_ || _)
      val bits = liveBloom(spark, path, mf).filter(wordPred)
        .collect().map { r =>
          (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3)
        }.toMap
      def valuePasses(f: String, c: String, ps: Seq[Int]): Boolean =
        ps.forall { p =>
          (bits.getOrElse((f, c, p / 64), 0L) & (1L << (p % 64))) != 0L
        }
      all.iterator.filterNot { f =>
        bloomTests.forall { case (c, sets) =>
          sets.exists(valuePasses(f, c, _))
        }
      }.toSet
    }
    val killed = zoneKilled ++ bloomKilled
    (all.filterNot(killed), all.length.toLong)
  }

  /** The PROVABLY-DEAD file keys for a conjunction of `filters`:
    * profiled files minus prune survivors, computed against ONE
    * manifest + ledger snapshot. The subtraction form integrators
    * want ([[MergeOnRead.readWhere]],
    * [[graft.plans.ZoneMapScan]]): subtracting the killed set from
    * their OWN file list means a lagging zone map can only keep
    * extra files, never drop an unprofiled one.
    */
  def pruneKilled(spark: SparkSession, path: String,
      filters: Seq[Filter]): Set[String] = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no zone map at $path"))
    val ents = liveLedgerEnts(spark, path, mf)
    val (survivors, _) = pruneWith(spark, path, mf, ents, filters)
    ents.map(_.key).toSet -- survivors
  }

  /** The live file LEDGER rows (key, readable uri, length, mtime) —
    * one per profiled file. What a consumer pinning the TABLE against
    * the zone map ([[graft.plans.ZoneMapScan.register]]) verifies its
    * listing against: a profiled file whose live (length, mtime)
    * differ was rewritten in place after profiling, and the zone
    * rows are stale in a way only a rebuild fixes.
    */
  def ledger(spark: SparkSession, path: String): Seq[FileEnt] = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no zone map at $path"))
    liveLedgerEnts(spark, path, mf)
  }

  /** The format-4 ledger's per-file CONTENT-FINGERPRINT partials:
    * file key → (length, mtime, fp partial, row count), one row per
    * profiled file, computed in the profiling scan itself. What a
    * sibling-artifact consumer ([[graft.plans.ColStatsInjection]])
    * seeds its pin-refresh partials from — scan-free, because the
    * build already paid the pass. The partials hash the declared
    * columns IN DECLARATION ORDER (numCols ++ strCols), so they
    * compose to [[ColStats.fingerprint]] of a table profiled with
    * the SAME declaration — the consumer must verify that column
    * match ([[declaration]]) before adopting them. None for
    * pre-format-4 artifacts (no stored partials).
    */
  def fingerprintLedger(spark: SparkSession,
      path: String): Option[Map[String, (Long, Long, Long, Long)]] = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no zone map at $path"))
    if (mf.fmt < 4) None
    else Some(liveLedger(spark, path, mf)
      .select("file", "flen", "fmtime", "cfp", "cn").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap)
  }

  /** Read the table through the zone map: prune the file list with
    * `filters`, scan only survivors. The predicate is NOT applied —
    * callers (and the SQL source's unhandled-filters contract)
    * re-evaluate it above, so pruning stays a pure prune.
    */
  def scan(spark: SparkSession, path: String,
      filters: Seq[Filter]): DataFrame = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no zone map at $path"))
    val schema = tableSchema(spark, path)
    // ONE manifest + ledger snapshot drives both the prune and the
    // uri resolution — a refresh committing mid-scan can't give a
    // torn two-version view
    val ents = liveLedgerEnts(spark, path, mf)
    val (files, _) = pruneWith(spark, path, mf, ents, filters)
    val keep = files.toSet
    // the ledger's qualified URIs are what a scan READS — the
    // scheme-free keys only join against input_file_name()
    val uris = ents.filter(e => keep(e.key)).map(_.uri)
    if (uris.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(uris: _*)
  }
}
