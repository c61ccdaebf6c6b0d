package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew and co-location tools for the 100 TB path.
  *
  * - Salted aggregation: a hot key that would pin one reducer is split across
  *   `salt` sub-keys; partials aggregate per (key, salt), then re-aggregate
  *   per key. Works for any algebraic aggregate (sum/count/min/max) because
  *   they compose; AQE's skew handling covers joins, but aggregation skew
  *   needs this explicit two-phase shape.
  * - Salted join: the skewed big side gets a deterministic salt from a row
  *   column; the small side is replicated across all salt values, turning one
  *   hot partition into `salt` even ones.
  * - Bucketed tables: pre-shuffled storage layout so repeated joins on the
  *   bucket key need no exchange at read time (the batch analogue of
  *   co-partitioned state).
  */
object Scale {

  /** Two-phase salted sum/count aggregation. `aggs` maps output column name
    * to (inputExpr, how) where how ∈ {"sum", "count", "min", "max"}. */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
                      aggs: Map[String, (Column, String)],
                      salt: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(keys.map(col) :+ spark_partition_id(): _*), lit(salt)))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        aggs.head._2 match { case (c, how) => phase1(c, how).as(aggs.head._1) },
        aggs.tail.map { case (name, (c, how)) => phase1(c, how).as(name) }.toSeq: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(
        phase2(col(aggs.head._1), aggs.head._2._2).as(aggs.head._1),
        aggs.tail.map { case (name, (_, how)) => phase2(col(name), how).as(name) }.toSeq: _*)
  }

  private def phase1(c: Column, how: String): Column = how match {
    case "sum" => sum(c)
    case "count" => count(c)
    case "min" => min(c)
    case "max" => max(c)
    case other => throw new IllegalArgumentException(s"unsupported agg: $other")
  }
  private def phase2(c: Column, how: String): Column = how match {
    case "sum" | "count" => sum(c) // counts re-combine by summing partials
    case "min" => min(c)
    case "max" => max(c)
    case other => throw new IllegalArgumentException(s"unsupported agg: $other")
  }

  /** Skew-join: big side salted deterministically from `saltSource` (any
    * column with per-row variety, e.g. a line number or id), small side
    * replicated across all salts. Equi-join on (key, salt). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltSource: Column, salt: Int = 16): DataFrame = {
    val b = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(salt)).cast("int"))
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Fan a scan out to the session's full parallelism when the source files
    * yield fewer splits than cores. Parquet can only split at row-group
    * boundaries, so a table written as one big row group scans as ONE
    * partition — and every CPU-heavy projection downstream (shingling,
    * signature hashing, multi-format timestamp parsing) runs single-threaded
    * no matter how many cores the session has. One cheap round-robin exchange
    * of the raw bytes buys full-width execution for all the expression work
    * that follows. At cluster scale this is a no-op by construction: a 100 TB
    * table scans as thousands of row-group splits, the condition fails, and
    * no shuffle is added.
    *
    * Call this at CPU-DENSE OPERATOR ENTRY POINTS (shingling, signature
    * hashing, dot products, cleaner chains), not at table load: a cheap scan
    * (one hash-aggregate over md5 keys) should not pay the exchange, and the
    * width probe does force physical planning, which belongs next to the
    * operator that is about to execute anyway. Width is read from the
    * PRE-ADAPTIVE physical plan's file-scan leaves (`queryExecution
    * .sparkPlan`): with AQE enabled — the default — `executedPlan` is an
    * AdaptiveSparkPlanExec, which is a LEAF node, so collectLeaves on it
    * never surfaces the file scan and the probe silently saw "not a file
    * scan" for every input (this function was a no-op engine-wide until
    * round 6 caught it via a single-threaded fuzzy-join stage). `df.rdd`
    * would additionally construct the full row-encoder RDD lineage just to
    * ask a number. Frames whose leaves are not file scans (local test
    * relations, join outputs — already exchanged) pass through untouched.
    *
    * Measured trade at sf0.1 (quiet windows, engaged vs no-op): pipelines
    * whose scan stage feeds heavy per-row work in the SAME stage win big
    * (fuzzy join 3.5 s -> 0.7 s); iterative/persisted pipelines pay a small
    * tax for the extra exchange + 32-way persisted partitions (minhash
    * +0.3 s, star components +0.5 s) — net about neutral on the full bench
    * with a 5x better worst query. At cluster scale the whole question
    * vanishes: wide scans make this a no-op by construction. */
  def fanOutScan(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val target = df.sparkSession.sparkContext.defaultParallelism
    val leaves = df.queryExecution.sparkPlan.collectLeaves()
    val widths = leaves.map {
      case s: FileSourceScanExec => s.inputRDDs().map(_.getNumPartitions).sum
      case _                     => -1
    }
    if (widths.nonEmpty && widths.forall(_ >= 0) && widths.sum < target)
      df.repartition(target)
    else df
  }

  /** Bloom-pruned equi-join: build a Bloom filter over the small side's join
    * keys as a distributed bit_or aggregate, pre-filter the big side against
    * it BEFORE the join's exchange, then run the exact equi-join. The output
    * EQUALS the plain join (a Bloom filter has false positives — removed by
    * the exact join — and no false negatives), so the oracle for any query
    * using this is the plain-join SQL; what changes is the plan: at 100 TB
    * with a dimension too big to broadcast (so the fact side must shuffle),
    * the filter drops every fact row whose key cannot match while the rows
    * are still map-side, cutting the exchange to matching + false-positive
    * rows. This is the hand-rolled twin of Spark's runtime row-group
    * filtering, usable where that can't reach (non-file sources, derived
    * keys, multi-column composites via a concat key).
    *
    * Representation: the filter is a TABLE of (word_index, 64-bit word) rows
    * — `bits/64` rows, KB-to-MB sized — built with one hash aggregate and
    * broadcast back; no driver collect, no UDF, the membership probe is `k`
    * broadcast joins + a bit test, all codegen'd. Positions use
    * Kirsch-Mitzenmacher double hashing (g_i = h1 + i*h2 mod bits) off two
    * independent xxhash64 seeds, so `k` costs no extra hash passes.
    *
    * Sizing: false-positive rate ~ (1 - e^(-k*n/bits))^k; the default 2^20
    * bits / k=2 gives ~3% fp at n = 100k distinct keys. At real scale size
    * `bits` to ~10x distinct-key count — the table stays broadcast-friendly
    * (2^30 bits = 16 MB) long after the dimension itself stops being so. */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, key: String,
                      bits: Int = 1 << 20, k: Int = 2): DataFrame =
    bloomPrune(big, small, key, bits, k).join(small, key)

  /** The pruning half of [[bloomPrunedJoin]]: `big` filtered to rows whose
    * key the Bloom filter admits (all matching rows + ~fp-rate of the rest).
    * Exposed separately so the prune ratio is observable (tests, and any
    * pipeline that wants the filter without the join — e.g. pruning a fact
    * table against a blocklist's complement). */
  def bloomPrune(big: DataFrame, small: DataFrame, key: String,
                 bits: Int = 1 << 20, k: Int = 2): DataFrame = {
    require(bits >= 64 && (bits & (bits - 1)) == 0, "bits must be a power of two >= 64")
    require(k >= 1 && k <= 8, "k must be in [1, 8]")
    // both hashes are reduced into [0, bits) BEFORE the Kirsch-Mitzenmacher
    // mix: raw xxhash64 values span the full long range, so h1 + i*h2 would
    // overflow under ANSI mode; reduced, the mix peaks below 9 * bits << 2^63
    def h1(c: Column) = pmod(xxhash64(c), lit(bits.toLong))
    def h2(c: Column) = pmod(xxhash64(c, lit(0x9e3779b9L)), lit(bits.toLong))
    def pos(c: Column, i: Int) = pmod(h1(c) + lit(i.toLong) * h2(c), lit(bits.toLong))
    val words = small.select(col(key)).na.drop().distinct()
      .select((0 until k).map(i => pos(col(key), i).as(s"p$i")): _*)
      .select(explode(array((0 until k).map(i => col(s"p$i")): _*)).as("p"))
      .groupBy(expr("p div 64").as("w"))
      .agg(bit_or(expr("shiftleft(cast(1 as bigint), cast(p % 64 as int))")).as("bm"))
    val pruned = (0 until k).foldLeft(big) { (df, i) =>
      val wcol = s"__w$i"
      df.withColumn(s"__p$i", pos(col(key), i))
        .withColumn(wcol, expr(s"__p$i div 64"))
        .join(broadcast(words.select(col("w").as(wcol), col("bm").as(s"__m$i"))),
          Seq(wcol), "left")
        .filter(col(s"__m$i").isNotNull &&
          expr(s"(shiftright(__m$i, cast(__p$i % 64 as int)) & cast(1 as bigint)) = 1"))
    }
    pruned.drop((0 until k).flatMap(i => Seq(s"__p$i", s"__w$i", s"__m$i")): _*)
  }

  /** Per-group top-k with k-BOUNDED aggregation state — the scale-right twin
    * of `ROW_NUMBER() OVER (PARTITION BY keys ORDER BY order) <= k`, which
    * fully SORTS every group (O(N log N) per group after a whole-corpus
    * shuffle). Here each map task keeps at most k rows per key (native
    * [[graft.plans.TopKAgg]]; map-side combine caps the shuffle at
    * k·keys·tasks rows) and the reduce merges k-bounded sorted runs —
    * `TakeOrderedAndProject` generalized from a global limit to per-key.
    *
    * `order` gives (column, descending?) pairs evaluated lexicographically;
    * they must reach a unique column (end in the row id) or equal-keyed rows
    * keep an arbitrary subset — the same nondeterminism the window twin has.
    * Output: keys ++ rnk (1-based) ++ order columns ++ payload columns. */
  def topKPerKey(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
                 k: Int, payload: Seq[String]): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    val ordCols = order.map(_._1)
    val flags = order.map(o => if (o._2) "D" else "A").mkString
    val fields = (ordCols ++ payload).distinct
    // struct(`a`, `b`) in SQL auto-names its fields after the referenced
    // columns, so the exploded payload below reads back by the same names
    val structSql = fields.map(f => s"`$f`").mkString("struct(", ", ", ")")
    val agged = df.groupBy(keys.map(col): _*)
      .agg(expr(s"graft_top_k($structSql, $k, '$flags')").as("top"))
    agged.select((keys.map(col) :+ posexplode(col("top")).as(Seq("pos", "row"))): _*)
      .select(keys.map(col) ++ Seq((col("pos") + 1).cast("int").as("rnk")) ++
        fields.map(f => col(s"row.$f").as(f)): _*)
  }

  /** Right-size a SMALL corpus before a long composed chain: when the
    * parquet footers say the whole table is under `minRowsPerTask` rows per
    * available slot, re-materialize it at rows/minRowsPerTask partitions so
    * the chain's dozens of stages schedule a handful of right-sized tasks
    * instead of `defaultParallelism` sliver tasks EACH (measured on the
    * composed curation chain at sf0.1: 8.4 -> 6.6 s warm, purely task-floor
    * savings). The inverse policy of [[fanOutScan]], same principle as
    * Spark's own size-based scan splitting and AQE's post-shuffle
    * coalescing — width should track data, not the core count.
    *
    * 100 TB shape: a corpus at or above minRowsPerTask x parallelism rows
    * passes through UNTOUCHED (no job, no checkpoint) — this branch exists
    * only for inputs so small that task overhead dominates, which is also
    * why the eager narrow checkpoint (one tiny job) is safe to pay. Footer
    * counts come from [[Similarity.parquetMetaCount]] (zero Spark jobs);
    * frames that are not bare parquet scans pass through untouched. */
  def rightSizeForChain(df: DataFrame, minRowsPerTask: Long = 1024L): DataFrame =
    rightSizeWidth(df, minRowsPerTask)
      .map(w => df.repartition(w).localCheckpoint(true)).getOrElse(df)

  /** [[rightSizeForChain]]'s width decision alone — Some(width) when the
    * parquet footers under `df`'s scan leaf say the corpus is small enough
    * that task floor dominates, None (leave untouched) otherwise. For
    * callers that re-materialize the narrow frame themselves (e.g. a
    * persisted per-doc cache an iterative loop re-scans) and so don't want
    * rightSizeForChain's eager checkpoint paid on top. */
  def rightSizeWidth(df: DataFrame, minRowsPerTask: Long = 1024L): Option[Int] = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    Similarity.parquetMetaCount(df) match {
      case Some(rows) if rows < minRowsPerTask * target =>
        Some(math.min(target.toLong, rows / minRowsPerTask + 1).toInt)
      case _ => None
    }
  }

  /** Write a table bucketed by `key` so later joins on it are exchange-free. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
