package graft.lake

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._

/** PLANNER-INTEGRATED data skipping: a [[FileIndex]] that consults the
  * manifest's partition values, the [[ZoneMapIndex]] sidecar, and the
  * [[BloomIndex]] sidecar from the filters Spark itself pushes down — so a
  * plain `AutoSkip.read(spark, root, t).filter(...)` prunes files for ANY
  * predicate, without the caller naming an index (the reference gets this
  * transparently from its engine: pmgraham/biglake-iceberg-pipeline
  * terraform/bigquery_tables.tf:97-116 declares Iceberg tables and
  * tools/quality.py queries never name an index — the engine prunes). The
  * API-mediated [[SkippingScan]] remains for callers that want the candidate
  * list itself; this is the path every OTHER query takes.
  *
  * How it plugs into Spark: [[read]] returns a DataFrame over a
  * `HadoopFsRelation` whose location is a [[SidecarFileIndex]]. Catalyst
  * optimizes the query normally; `FileSourceStrategy` hands the pushed-down
  * data filters to `FileIndex.listFiles`, which keeps only files whose
  * sidecar evidence admits a match. The physical plan RETAINS the full
  * filter, so pruning can only drop files that provably contain no matching
  * row — correctness never depends on the sidecars, they only shrink I/O.
  *
  * Superset guarantee under churn: data files in this lake are IMMUTABLE
  * (commits add or remove whole files, never rewrite in place), and a file
  * the sidecars do not cover is kept UNCONDITIONALLY. So a stale sidecar —
  * mid-refresh, racing an append or compaction, missing entirely, torn —
  * can only cost extra file opens, never rows. The pruning decision per
  * file: (no zone evidence OR zone overlaps) AND (no bloom evidence OR
  * bloom admits).
  *
  * 100 TB shape: the pruning decision is file-manifest-sized driver work
  * (the same budget the scheduler spends listing the table); the zone/
  * partition bounds are collected once per read handle (files × indexed
  * columns), and the Bloom membership test runs as one index-sized Spark
  * job per distinct point-value set, never touching data files. */
object AutoSkip {

  private def pathOf(s: String): String = LakePaths.pathOf(s)

  private def idxLake(root: String, t: String) =
    new ParquetDirFormat(s"$root/$t/idx")
  private def bloomTable(c: String) = s"bloom__$c"

  // serialize in-process refreshers per table: two concurrent index() calls
  // racing the SAME next version of the sidecar lake could tear each other's
  // snapshot write (ParquetDirFormat is single-writer; the DATA lake's CAS
  // protocol is PartitionedTable's). Cross-process races stay benign — a
  // torn generation reads as "no sidecar" and costs pruning, never rows.
  private val refreshLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  /** Build (or incrementally refresh) the table's skipping sidecars: a zone
    * map over `zoneCols` and one Bloom filter per `bloomCols` entry, stored
    * as VERSIONED [[ParquetDirFormat]] tables under the table directory so
    * every later [[read]] finds them without being told. Refresh is the
    * sidecars' own set algebra — only files missing from the sidecar are
    * scanned. Each refresh commits a NEW immutable snapshot and old
    * generations are retained (see [[expireIndexGenerations]]), so a read
    * handle opened against any committed generation stays stable under
    * concurrent refreshes — the superset guarantee needs no coordination. */
  def index(spark: SparkSession, root: String, t: String,
            zoneCols: Seq[String], bloomCols: Seq[String] = Seq.empty): Unit =
    indexFrom(spark, root, t, PartitionedTable.open(root, t).read(spark, t),
      zoneCols, bloomCols)

  /** [[index]] for a plain versioned [[ParquetDirFormat]] table — same
    * sidecar layout under `<root>/<t>/idx` (the `idx` directory never
    * matches the `v<N>` version-dir pattern, so the table's own version
    * resolution ignores it). */
  def indexDir(spark: SparkSession, root: String, t: String,
               zoneCols: Seq[String], bloomCols: Seq[String] = Seq.empty): Unit =
    indexFrom(spark, root, t, new ParquetDirFormat(root).read(spark, t),
      zoneCols, bloomCols)

  private def indexFrom(spark: SparkSession, root: String, t: String,
                        df: DataFrame, zoneCols: Seq[String],
                        bloomCols: Seq[String]): Unit =
    refreshLocks.getOrElseUpdate(s"$root/$t", new Object).synchronized {
      val lake = idxLake(root, t)
      def put(build: => DataFrame, name: String): Unit = {
        val snap = build.coalesce(1)
        if (lake.exists(name)) lake.overwrite(snap, name)
        else lake.create(snap, name)
      }
      if (zoneCols.nonEmpty) put(
        if (lake.exists("zonemap"))
          ZoneMapIndex.refresh(df, lake.read(spark, "zonemap"), zoneCols)
        else ZoneMapIndex.build(df, zoneCols),
        "zonemap")
      bloomCols.foreach { c =>
        put(
          if (lake.exists(bloomTable(c)))
            BloomIndex.refresh(df, lake.read(spark, bloomTable(c)), c)
          else BloomIndex.build(df, c),
          bloomTable(c))
      }
    }

  /** Maintenance: drop superseded sidecar generations, RETAINING the
    * `retainLast` most recent predecessors of the current one (each refresh
    * commits a new generation, so in-flight read handles opened up to
    * `retainLast` refreshes ago keep their snapshot; older handles degrade
    * to unpruned-but-correct reads via the superset guarantee). The
    * write-transparent refresh ([[refreshAfterCommit]]) applies this policy
    * automatically so per-commit refreshes cannot accumulate one sidecar
    * snapshot per table commit forever; call directly for a tighter
    * schedule. */
  def expireIndexGenerations(root: String, t: String, retainLast: Int = 0): Unit = {
    val lake = idxLake(root, t)
    (Seq("zonemap") ++ lake.tables().filter(_.startsWith("bloom__")))
      .distinct.filter(lake.exists)
      .foreach(lake.expireSnapshots(_, retainLast))
  }

  /** How many superseded sidecar generations a write-transparent refresh
    * retains (see [[expireIndexGenerations]]). */
  val CommitRefreshRetain = 3

  /** WRITE-transparent sidecar maintenance — the commit hook both lake
    * formats call after a successful data commit: iff the table has sidecars
    * (someone called [[index]]/[[indexDir]] at least once), refresh them
    * against the just-committed snapshot, discovering the indexed column
    * sets from the sidecars themselves (zone columns from the zonemap's
    * `<c>__min` fields, Bloom columns from the `bloom__<c>` table names).
    * A plain `append` → plain [[read]] therefore prunes the NEW files with
    * no `index()` call in user code — the reference's engines maintain
    * statistics on every load the same way (BigQuery keeps Iceberg metadata
    * itself, terraform/bigquery_tables.tf:97-116; DuckDB computes zone maps
    * at write time).
    *
    * Cost: refresh is the sidecars' own set algebra — only files missing
    * from the sidecar are scanned. For APPENDS that is the increment just
    * written; for REWRITE verbs (overwrite/compact/z-order/heavy upserts)
    * every rewritten file is "missing", so the hook re-profiles what the
    * commit rewrote — one extra read of the rewritten volume for the zone
    * map plus one per Bloom column. That is the price of stats-at-write
    * (DuckDB pays it inside the write; BigQuery maintains Iceberg metadata
    * per load) and it is proportional to the commit's own write volume,
    * never to an untouched remainder. Un-indexed tables pay two file
    * stats. Old generations beyond
    * [[CommitRefreshRetain]] are expired here too, so steady-state sidecar
    * storage is O(retain), not O(commits). Failure NEVER fails the data
    * commit (it already landed): any error degrades to a stale sidecar,
    * which the superset guarantee makes correct-but-unpruned. Recursion
    * terminates structurally: sidecar tables live in a ParquetDirFormat
    * lake whose own tables have no `idx` directory, so their commits no-op
    * here. */
  private[lake] def refreshAfterCommit(spark: SparkSession, root: String,
                                       t: String, df: => DataFrame): Unit =
    try {
      val lake = idxLake(root, t)
      val hasZone = lake.exists("zonemap")
      val bloomCols = scala.util.Try(lake.tables()).getOrElse(Seq.empty)
        .filter(_.startsWith("bloom__")).map(_.stripPrefix("bloom__"))
      if (!hasZone && bloomCols.isEmpty) return
      val zoneCols =
        if (!hasZone) Seq.empty[String]
        else lake.read(spark, "zonemap").schema.fieldNames.toSeq
          .filter(_.endsWith("__min")).map(_.stripSuffix("__min"))
      indexFrom(spark, root, t, df, zoneCols, bloomCols)
      expireIndexGenerations(root, t, CommitRefreshRetain)
    } catch {
      case scala.util.control.NonFatal(e) =>
        log.warn(s"sidecar refresh after commit on $root/$t failed " +
          s"(reads stay correct, pruning may lag until the next refresh): $e")
    }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Open the table for reading THROUGH the sidecars: any filter later
    * applied to the returned frame prunes files automatically. Missing or
    * unreadable sidecars degrade to an unpruned (still correct) scan. The
    * handle snapshots the manifest at call time, like every other read in
    * this lake. */
  def read(spark: SparkSession, root: String, t: String): DataFrame = {
    val table = PartitionedTable.open(root, t)
    val schema = table.read(spark, t).schema
    val withId = table.dataFileStatuses(t)
    val partVals = withId.map { case (id, st) =>
      pathOf(st.getPath.toString) -> table.idToValues(id)
    }.toMap
    open(spark, root, t, withId.map(_._2), partVals, schema,
      virtualPartCols = Seq.empty)
  }

  /** [[read]] for a plain versioned [[ParquetDirFormat]] table: the same
    * transparent pruning, with partition values (when the table was
    * createPartitioned) recovered from the `c=v` path segments Spark wrote
    * inside the snapshot directory. */
  def readDir(spark: SparkSession, root: String, t: String): DataFrame = {
    val table = new ParquetDirFormat(root)
    val schema = table.read(spark, t).schema
    val statuses = table.dataFileStatuses(t)
    val parts = table.partitionSpec(t).toSet
    val partVals = statuses.map { st =>
      val vals = st.getPath.toString.split("/").filter(_.contains("="))
        .map { seg =>
          val Array(k, v) = seg.split("=", 2)
          k -> unescapePathName(v)
        }.filter(kv => parts(kv._1)).toMap
      pathOf(st.getPath.toString) -> vals
    }.toMap
    open(spark, root, t, statuses, partVals, schema,
      virtualPartCols = table.partitionSpec(t))
  }

  private def unescapePathName(s: String): String = LakePaths.unescapePathName(s)

  /** `virtualPartCols`: partition columns NOT present in the data files
    * (Spark's own `partitionBy` strips them — the ParquetDirFormat layout).
    * They become the FileIndex's REAL partitionSchema, with per-file values
    * parsed from the path, because Spark removes partition-only predicates
    * from the post-scan filter and trusts the FileIndex to prune them
    * EXACTLY. PartitionedTable passes none: its shadow-column layout keeps
    * real columns in the files, so every predicate stays a data filter. */
  private def open(spark: SparkSession, root: String, t: String,
                   statuses: Seq[FileStatus],
                   partVals: Map[String, Map[String, String]],
                   schema: StructType,
                   virtualPartCols: Seq[String]): DataFrame = {
    // partition values from the layout's path mapping: exact bounds
    // (min = max = value) for STRING partition columns; Hive's default-
    // partition marker means "this column is null here". Non-string
    // partition columns are skipped (their path rendering is not the
    // column's value space) — the zone sidecar covers those if indexed.
    val stringPartCols = schema.fields
      .filter(_.dataType == StringType).map(_.name).toSet
    val partBounds: Map[String, Map[String, ColZone]] = partVals.map {
      case (key, vals) =>
        val zones = vals.collect {
          case (c, raw) if stringPartCols(c) =>
            if (raw == "__HIVE_DEFAULT_PARTITION__")
              c -> ColZone(null, null, nulls = 1L, rows = 1L)
            else {
              val v = org.apache.spark.unsafe.types.UTF8String.fromString(raw)
              c -> ColZone(v, v, nulls = 0L, rows = 1L)
            }
        }
        key -> zones
    }

    // sidecars resolve through the VERSIONED index lake: the handle pins one
    // committed immutable generation (resolved LAZILY, on the first
    // listFiles that actually carries filters — a projection-only read must
    // not pay one Spark job per sidecar it can never use). Existence-gated
    // (no probe cost for indexes never built); a torn/unreadable sidecar
    // degrades to "no pruning" via the Try.
    val lake = idxLake(root, t)
    val zonesF: () => Map[String, Map[String, ColZone]] = () =>
      if (!lake.exists("zonemap")) Map.empty
      else scala.util.Try(collectZones(lake.read(spark, "zonemap")))
        .getOrElse(Map.empty)

    val bloomsF: () => Seq[BloomSidecar] = () => schema.fields.toSeq
      .filter(f => bloomSafeType(f.dataType))
      .filter(f => scala.util.Try(lake.exists(bloomTable(f.name))).getOrElse(false))
      .flatMap { f =>
        scala.util.Try {
          val idx = lake.read(spark, bloomTable(f.name))
          val covered = idx.select("file").distinct()
            .collect().map(r => pathOf(r.getString(0))).toSet
          BloomSidecar(f.name, f.dataType, idx, covered)
        }.toOption
      }

    val partSchema = StructType(schema.fields.filter(f => virtualPartCols.contains(f.name)))
    val dataSchema = StructType(schema.fields.filterNot(f => virtualPartCols.contains(f.name)))
    // per-file partition VALUES in the partition schema's own types (legacy
    // string cast, the same parse partition discovery applies); the raw
    // string map doubles as the grouping key in listFiles
    val partRows: Map[String, (Map[String, String], InternalRow)] =
      if (partSchema.isEmpty) Map.empty
      else statuses.map { st =>
        val key = pathOf(st.getPath.toString)
        val vals = partVals.getOrElse(key, Map.empty)
        val row = InternalRow.fromSeq(partSchema.fields.toSeq.map { f =>
          vals.get(f.name) match {
            case Some(raw) if raw != "__HIVE_DEFAULT_PARTITION__" =>
              // the SESSION time zone, not a hardcoded UTC: Spark's own
              // partition discovery parses timestamp/date partition values
              // under sessionLocalTimeZone, and the served values must agree
              // with it (r12 ADVICE)
              scala.util.Try(Cast(
                Literal(org.apache.spark.unsafe.types.UTF8String.fromString(raw),
                  StringType), f.dataType,
                Option(spark.sessionState.conf.sessionLocalTimeZone)).eval(null))
                .getOrElse(null)
            case _ => null
          }
        })
        key -> (vals.filter(kv => partSchema.fieldNames.contains(kv._1)), row)
      }.toMap
    val fileIndex = new SidecarFileIndex(spark, new HPath(s"$root/$t"),
      statuses, partBounds, zonesF, bloomsF, partSchema, partRows)
    val relation = HadoopFsRelation(fileIndex, partSchema, dataSchema, None,
      new ParquetFileFormat, Map.empty[String, String])(spark)
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .baseRelationToDataFrame(relation)
  }

  /** The [[SidecarFileIndex]] behind a frame [[read]] produced (after any
    * number of filters/projections) — lets specs assert which files the last
    * action actually opened via [[SidecarFileIndex.lastKept]]. */
  private[graft] def fileIndexOf(df: DataFrame): Option[SidecarFileIndex] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: HadoopFsRelation => h.location match {
            case s: SidecarFileIndex => Some(s)
            case _ => None
          }
          case _ => None
        }
    }.flatten

  /** Per-file, per-column pruning evidence in CATALYST-INTERNAL values
    * (UTF8String for strings, raw primitives elsewhere) so comparisons run
    * in the column's own type against filter literals directly. A null
    * min/max with nulls >= rows means "no non-null value in this file". */
  private[graft] final case class ColZone(min: Any, max: Any, nulls: Long, rows: Long)

  private[graft] final case class BloomSidecar(col: String, dt: DataType,
                                              index: DataFrame, covered: Set[String])

  /** Types whose JVM toString equals Spark's CAST(x AS STRING) — the
    * canonical form [[BloomIndex]] hashes. Restricting bloom pruning to
    * these types is what keeps a rendering mismatch from becoming a false
    * negative (= lost rows). */
  private def bloomSafeType(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | ShortType | ByteType => true
    case _ => false
  }

  private def collectZones(idx: DataFrame): Map[String, Map[String, ColZone]] = {
    val cols = idx.schema.fieldNames.filter(_.endsWith("__min")).map(_.dropRight(5))
    val rowsIdx = idx.schema.fieldIndex("rows")
    val fileIdx = idx.schema.fieldIndex("file")
    val colMeta = cols.map { c =>
      val dt = idx.schema(s"${c}__min").dataType
      (c, idx.schema.fieldIndex(s"${c}__min"), idx.schema.fieldIndex(s"${c}__max"),
        idx.schema.fieldIndex(s"${c}__nulls"),
        CatalystTypeConverters.createToCatalystConverter(dt))
    }
    idx.collect().map { r =>
      val rows = r.getLong(rowsIdx)
      val zones = colMeta.map { case (c, mi, ma, nu, conv) =>
        val mn = if (r.isNullAt(mi)) null else conv(r.get(mi))
        val mx = if (r.isNullAt(ma)) null else conv(r.get(ma))
        c -> ColZone(mn, mx, r.getLong(nu), rows)
      }.toMap
      pathOf(r.getString(fileIdx)) -> zones
    }.toMap
  }

  /** The [[FileIndex]] doing the transparent pruning. For the
    * PartitionedTable layout `partSchema` is empty on purpose — partition
    * columns live IN the data files (shadow-column layout), so every
    * predicate arrives as a data filter and one bounds mechanism covers
    * partition, zone, and bloom evidence uniformly. For ParquetDirFormat
    * layouts (`partitionBy`-stripped columns) `partSchema` carries the
    * virtual partition columns and listFiles must — and does — apply the
    * partition filters EXACTLY against each file's parsed values, because
    * Spark removes partition-only predicates from the post-scan filter. */
  private[graft] final class SidecarFileIndex(
      spark: SparkSession, root: HPath, allFiles: Seq[FileStatus],
      partBounds: Map[String, Map[String, ColZone]],
      zonesF: () => Map[String, Map[String, ColZone]],
      bloomsF: () => Seq[BloomSidecar],
      partSchema: StructType = new StructType(),
      partRows: Map[String, (Map[String, String], InternalRow)] = Map.empty)
    extends FileIndex {

    // forced only by a filtered listFiles — see the open() scaladoc
    private lazy val zones = zonesF()
    private lazy val blooms = bloomsF()

    /** Last pruning outcome, for specs asserting which files a query opened. */
    @volatile var lastKept: Seq[String] = allFiles.map(_.getPath.toString)

    override def rootPaths: Seq[HPath] = Seq(root)
    override def partitionSchema: StructType = partSchema
    override def sizeInBytes: Long = allFiles.map(_.getLen).sum
    override def inputFiles: Array[String] = allFiles.map(_.getPath.toString).toArray
    override def refresh(): Unit = () // snapshot handle — reopen via AutoSkip.read

    // one bloom membership job per distinct (column, value-set) per handle
    private val bloomCache =
      scala.collection.concurrent.TrieMap.empty[(String, Set[String]), Set[String]]

    override def listFiles(partitionFilters: Seq[Expression],
                           dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
      val filters = partitionFilters ++ dataFilters
      if (filters.isEmpty) {
        // nothing can prune — answer from the listing alone, never forcing
        // the sidecar reads
        lastKept = allFiles.map(_.getPath.toString)
        return groupDirs(allFiles)
      }
      val bloomKeeps: Seq[(BloomSidecar, Set[String])] = blooms.flatMap { b =>
        pointValues(filters, b.col, b.dt).map { vs =>
          b -> bloomCache.getOrElseUpdate((b.col, vs),
            BloomIndex.candidateFiles(spark, b.index, vs.toSeq.sorted)
              .map(pathOf).toSet)
        }
      }
      // EXACT partition-filter predicate over the virtual partition values
      // (bind by name, null evals drop — SQL filter semantics); the bounds
      // mechanism below additionally prunes on anything it understands
      val exactPart: InternalRow => Boolean =
        if (partSchema.isEmpty || partitionFilters.isEmpty) _ => true
        else {
          val bound = partitionFilters.map(_.transform {
            case a: AttributeReference =>
              val i = partSchema.fieldIndex(a.name)
              BoundReference(i, partSchema.fields(i).dataType, nullable = true)
          }).reduce(And)
          val pred = Predicate.createInterpreted(bound)
          row => pred.eval(row)
        }
      val kept = allFiles.filter { st =>
        val key = pathOf(st.getPath.toString)
        val bounds = partBounds.getOrElse(key, Map.empty) ++
          zones.getOrElse(key, Map.empty)
        partRows.get(key).forall(pr => exactPart(pr._2)) &&
          filters.forall(f => keepByBounds(bounds, f)) &&
          bloomKeeps.forall { case (b, cand) => !b.covered(key) || cand(key) }
      }
      lastKept = kept.map(_.getPath.toString)
      groupDirs(kept)
    }

    private def groupDirs(files: Seq[FileStatus]): Seq[PartitionDirectory] =
      if (partSchema.isEmpty)
        Seq(PartitionDirectory(InternalRow.empty, files.toArray))
      else
        files.groupBy(st => partRows.get(pathOf(st.getPath.toString)).map(_._1))
          .map { case (_, sts) =>
            val row = partRows.get(pathOf(sts.head.getPath.toString))
              .map(_._2).getOrElse(InternalRow.empty)
            PartitionDirectory(row, sts.toArray)
          }.toSeq

    /** Conservative zone evaluation: true = the file MIGHT contain a
      * matching row (keep), false = provably cannot (prune). Unhandled
      * expression shapes keep the file — pruning is an optimization with a
      * one-sided error budget. */
    private def keepByBounds(b: Map[String, ColZone], e: Expression): Boolean = e match {
      case And(l, r) => keepByBounds(b, l) && keepByBounds(b, r)
      case Or(l, r) => keepByBounds(b, l) || keepByBounds(b, r)
      case EqualTo(a: AttributeReference, Literal(v, dt)) => overlaps(b, a, dt, Some(v), Some(v))
      case EqualTo(Literal(v, dt), a: AttributeReference) => overlaps(b, a, dt, Some(v), Some(v))
      case EqualNullSafe(a: AttributeReference, Literal(null, _)) => mightBeNull(b, a)
      case EqualNullSafe(a: AttributeReference, Literal(v, dt)) => overlaps(b, a, dt, Some(v), Some(v))
      case GreaterThan(a: AttributeReference, Literal(v, dt)) => overlaps(b, a, dt, Some(v), None)
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, dt)) => overlaps(b, a, dt, Some(v), None)
      case LessThan(a: AttributeReference, Literal(v, dt)) => overlaps(b, a, dt, None, Some(v))
      case LessThanOrEqual(a: AttributeReference, Literal(v, dt)) => overlaps(b, a, dt, None, Some(v))
      case GreaterThan(Literal(v, dt), a: AttributeReference) => overlaps(b, a, dt, None, Some(v))
      case GreaterThanOrEqual(Literal(v, dt), a: AttributeReference) => overlaps(b, a, dt, None, Some(v))
      case LessThan(Literal(v, dt), a: AttributeReference) => overlaps(b, a, dt, Some(v), None)
      case LessThanOrEqual(Literal(v, dt), a: AttributeReference) => overlaps(b, a, dt, Some(v), None)
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists { case Literal(v, dt) => overlaps(b, a, dt, Some(v), Some(v)) }
      case InSet(a: AttributeReference, vs) =>
        vs.exists(v => overlaps(b, a, a.dataType, Some(v), Some(v)))
      case IsNull(a: AttributeReference) => mightBeNull(b, a)
      case IsNotNull(a: AttributeReference) =>
        b.get(a.name).forall(z => z.nulls < z.rows)
      case _ => true
    }

    private def mightBeNull(b: Map[String, ColZone], a: AttributeReference): Boolean =
      b.get(a.name).forall(_.nulls > 0L)

    /** Does the file's [min, max] for `a` overlap [lo, hi]? Literal values
      * whose type differs from the stored bounds' type keep the file (a
      * cast the planner inserted that we will not second-guess). A file
      * with no non-null value for the column cannot match any range. */
    private def overlaps(b: Map[String, ColZone], a: AttributeReference,
                         dt: DataType, lo: Option[Any], hi: Option[Any]): Boolean =
      b.get(a.name) match {
        case None => true
        case Some(z) =>
          if (z.nulls >= z.rows || z.min == null || z.max == null) false
          else if (dt != a.dataType) true
          else {
            val ord = TypeUtils.getInterpretedOrdering(dt)
            lo.forall(v => v == null || ord.compare(z.max, v) >= 0) &&
              hi.forall(v => v == null || ord.compare(z.min, v) <= 0)
          }
      }

    /** Point values a TOP-LEVEL conjunct pins `c` to, rendered in the
      * canonical string form the Bloom sidecar hashes; None when no such
      * conjunct exists (no bloom pruning for this query). */
    private def pointValues(filters: Seq[Expression], c: String,
                            dt: DataType): Option[Set[String]] = {
      def render(v: Any): Option[String] =
        Option(v).map(x => CatalystTypeConverters.convertToScala(x, dt).toString)
      val sets = filters.flatMap {
        case EqualTo(a: AttributeReference, Literal(v, ldt))
          if a.name == c && ldt == dt => render(v).map(Set(_))
        case EqualTo(Literal(v, ldt), a: AttributeReference)
          if a.name == c && ldt == dt => render(v).map(Set(_))
        case In(a: AttributeReference, vs)
          if a.name == c && vs.forall { case Literal(_, ldt) => ldt == dt; case _ => false } =>
          Some(vs.flatMap { case Literal(v, _) => render(v) }.toSet)
        case InSet(a: AttributeReference, vs) if a.name == c =>
          Some(vs.flatMap(render).toSet)
        case _ => None
      }
      if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
    }
  }
}
