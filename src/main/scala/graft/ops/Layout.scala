package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: z-order (Morton) clustering for
  * multi-dimension file/row-group pruning.
  *
  * Why at 100 TB: a table hash-clustered on one key prunes scans on
  * THAT key only — a filter on (host, time) against a url-hash layout
  * reads everything. Interleaving the bits of two quantized dimensions
  * into one sort key gives every output file a narrow min/max envelope
  * in BOTH dimensions simultaneously, so parquet row-group statistics
  * prune two-dimensional predicates without a second copy of the data.
  * The whole kernel is exact 64-bit integer arithmetic — power-of-two
  * bucket widths make quantization a SHIFT (never a divide, which is
  * floating-point on Spark Columns; never a (v-min)*65535/range
  * product, which overflows past ~2^47 ranges) — codegen-friendly
  * (built-in shift/and/or Columns only), and mirrored verbatim in the
  * DuckDB oracle (zorder_layout).
  *
  * Clustering deliberately avoids repartitionByRange: its sampling
  * pass re-executes the upstream plan (see CLAUDE.md perf facts).
  * Instead rows hash-shuffle on the COARSE z-prefix (the top bits that
  * identify the target cell) and sort by the full key within each
  * partition — one exchange, no sampling, deterministic cell
  * assignment. Hash collisions can co-locate two distant z-cells in
  * one FILE (file-level envelope widens at the junction), but the
  * within-partition sort keeps every ROW GROUP a contiguous z-run, so
  * row-group pruning — the one that bounds bytes read — stays tight.
  */
object Layout {

  /** Morton spread/interleave mask-shift schedule for 16-bit inputs
    * (classic magic numbers): after the chain, bit i of the input sits
    * at bit 2i of the output. Public so the DuckDB mirror
    * (OracleSqlGen.zorderLayout) generates from the SAME schedule.
    */
  private[graft] val SpreadSteps: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Spread the low 16 bits of `x` over 32 bits (bit i → bit 2i). */
  def spreadBits(x: Column): Column =
    SpreadSteps.foldLeft(x) { case (c, (s, m)) =>
      c.bitwiseOR(shiftleft(c, s)).bitwiseAND(lit(m))
    }

  /** JVM reference of [[spreadBits]] (for specs). */
  private[graft] def spreadBitsJvm(x0: Long): Long =
    SpreadSteps.foldLeft(x0) { case (x, (s, m)) => (x | (x << s)) & m }

  /** 32-bit Morton code of two 16-bit bucket columns: a's bits on even
    * positions, b's on odd. Monotone-local: keys close in z-value are
    * close in BOTH a and b.
    */
  def mortonCol(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Signed quantizer shift t = bits(maxV - minV) - 16: positive →
    * right-shift a wide range DOWN into 16 bits; negative → left-shift
    * a narrow range UP so buckets always occupy the FULL 16-bit width
    * (without the up-shift a small-range dimension never reaches the
    * key's high bits and every row lands in cell 0 — the coarse
    * z-prefix must be meaningful at any data scale). Exact-integer
    * both ways: never a divide (floating-point on Columns), never a
    * (v-min)*65535/range product (overflows past ~2^47 ranges).
    * Mirrored in DuckDB via bits = min s in [0,63] with (range >> s)
    * = 0, then greatest(0, bits-16) / greatest(0, 16-bits).
    */
  def bucketShift(minV: Long, maxV: Long): Int = {
    require(maxV >= minV, s"bucketShift: max $maxV < min $minV")
    64 - java.lang.Long.numberOfLeadingZeros(maxV - minV) - 16
  }

  /** Quantize a long column into full-width 16-bit buckets under known
    * bounds: bucket = (v - minV) >> t (t >= 0) or << -t (t < 0), with
    * t = [[bucketShift]]. Always in [0, 65535], exact in Long
    * arithmetic (v >= minV by contract, so the subtraction never wraps
    * under ANSI mode; the up-shift product stays under 2^16).
    */
  def bucket16(v: Column, minV: Long, shift: Int): Column = {
    val x = v - lit(minV)
    if (shift >= 0) shiftrightunsigned(x, shift) else shiftleft(x, -shift)
  }

  /** The z-key of two long columns under known bounds. */
  def zkeyCol(a: Column, aMin: Long, aMax: Long,
              b: Column, bMin: Long, bMax: Long): Column =
    mortonCol(bucket16(a, aMin, bucketShift(aMin, aMax)),
      bucket16(b, bMin, bucketShift(bMin, bMax)))

  /** min/max bounds of two long-castable columns in one tiny aggregate. */
  private def bounds(df: DataFrame, colA: String, colB: String)
      : (Long, Long, Long, Long) = {
    val r = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** Per-cell envelope census of the z-order layout: cell = the top
    * log2(nCells) bits of the 32-bit z-key (the unit a file inherits),
    * with each cell's row count and min/max extent in BOTH source
    * dimensions — the statistics a scan planner would prune on, and
    * the oracle-checkable face of the layout kernel (zorder_layout).
    */
  def envelopeCensus(df: DataFrame, colA: String, colB: String,
                     nCells: Int = 32): DataFrame = {
    require(nCells > 0 && (nCells & (nCells - 1)) == 0,
      s"nCells must be a power of two, got $nCells")
    val (aMin, aMax, bMin, bMax) = bounds(df, colA, colB)
    val cellShift = 32 - java.lang.Long.numberOfTrailingZeros(nCells.toLong).toInt
    df.withColumn("_zkey",
        zkeyCol(col(colA).cast("long"), aMin, aMax,
          col(colB).cast("long"), bMin, bMax))
      .groupBy(shiftrightunsigned(col("_zkey"), cellShift).as("cell_id"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        min(col(colA).cast("long")).as("a_min"),
        max(col(colA).cast("long")).as("a_max"),
        min(col(colB).cast("long")).as("b_min"),
        max(col(colB).cast("long")).as("b_max"))
      .orderBy(col("cell_id"))
  }

  /** Probe values steering each slot s in [0, n) to partition s under
    * Spark's HashPartitioning (pmod(murmur3(long), n)): probes(s) is
    * the smallest non-negative long whose catalyst murmur3 lands on s,
    * found by driver-side search against the SAME hash class the
    * executors evaluate (spark-unsafe Murmur3_x86_32.hashLong, seed
    * 42 — what Murmur3Hash compiles to for one LongType child). ~n·ln n
    * trial hashes — microseconds for any realistic file count. A
    * bijective cell→file assignment beats hashing the cell id
    * directly: hash collisions co-locate two DISTANT z-cells in one
    * file, widening its envelope to the union.
    */
  private[graft] def slotProbes(n: Int): Array[Long] = {
    val probes = new Array[Long](n)
    val found = new Array[Boolean](n)
    var p = 0L
    var remaining = n
    while (remaining > 0) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(p, 42)
      val slot = ((h % n) + n) % n
      if (!found(slot)) { found(slot) = true; probes(slot) = p; remaining -= 1 }
      p += 1
    }
    probes
  }

  /** Cluster `df` into `nFiles` outputs z-ordered on (colA, colB):
    * bounds in ONE small aggregate, shuffle on the coarse z-prefix
    * (top bits → cell id, deterministic, NO range-sampling pass), sort
    * by the full z-key within each partition. Every emitted row group
    * then carries a narrow (colA, colB) min/max envelope for pruning
    * conjunctive range predicates on either or both dimensions.
    *
    * Cell→partition assignment is BIJECTIVE, not hashed: cell c maps
    * to slot c·nFiles/nCells (a contiguous z-range per file — exactly
    * the coarse prefix when nFiles is a power of two) and each slot is
    * steered to its own partition via [[slotProbes]]. No collision can
    * junction two distant z-cells into one file, so file-level
    * envelopes stay as narrow as row-group ones.
    */
  def zorderCluster(df: DataFrame, colA: String, colB: String,
                    nFiles: Int = 32): DataFrame = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val (aMin, aMax, bMin, bMax) = bounds(df, colA, colB)
    // cells = next power of two >= nFiles
    val cellBits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1, nFiles - 1).toLong).toInt
    val cellShift = 32 - cellBits
    val keyed = df.withColumn("_zkey",
      zkeyCol(col(colA).cast("long"), aMin, aMax,
        col(colB).cast("long"), bMin, bMax))
    // slot = cell * nFiles / 2^cellBits as an exact integer SHIFT
    // (Column `/` is floating-point; the product is bounded by
    // 2^cellBits * nFiles, far under Long range)
    val slot = shiftrightunsigned(
      shiftrightunsigned(col("_zkey"), cellShift) * nFiles, cellBits)
    keyed
      .withColumn("_slot",
        element_at(typedlit(slotProbes(nFiles).toSeq), (slot + 1).cast("int")))
      .repartition(nFiles, col("_slot"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey", "_slot")
  }
}
