package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Gorilla / Prometheus XOR chunk encoding cost model
  * (tsdb/chunkenc/xor.go; Pelkonen et al., "Gorilla", VLDB 2015) —
  * the TSDB's actual at-rest sample format, whose compression ratio is
  * what makes 100 TB of raw samples a few TB of chunks.
  *
  * Per 120-sample chunk (the head-chunk cut size):
  *  - timestamps: t₀ and the first delta as zigzag varints, then
  *    delta-of-delta bucket codes — `0` (1 bit), `10`+14, `110`+17,
  *    `1110`+20, `1111`+64 — xor.go's exact bit ranges;
  *  - values: IEEE-754 bits XORed against the previous sample; zero XOR
  *    is 1 bit, a window-compatible XOR re-uses the previous
  *    leading/trailing-zero window (`10` + meaningful bits), otherwise
  *    `11` + 5-bit leading count (clamped to 31) + 6-bit size +
  *    meaningful bits.
  *
  * Spark-first split: the timestamp side is PURE WINDOW MATH (dod needs
  * two lags — no recursion), computed before any aggregation; only the
  * value side is genuinely sequential (the reuse decision depends on the
  * running window), and it folds per chunk with `aggregate` over a
  * ≤120-element collected array — bounded state, fully distributed
  * across (series, chunk) groups. The IEEE bit reinterpret is the
  * [[graft.functions.DoubleBits]] codegen expression.
  */
object Gorilla {

  /** uvarint bit cost of a non-negative long (8 bits per 7 payload bits;
    * 0 still costs one byte — bin(0) = "0" has length 1). */
  private def uvarintBits(x: Column): Column =
    (((length(bin(x)) + lit(6)) / lit(7)).cast("int") * 8).cast("long")

  private def lead0(x: Column): Column =
    when(x < 0, lit(0)).otherwise(lit(64) - length(bin(x)))

  private def trail0(x: Column): Column =
    length(bin(x)) - length(rtrim(bin(x), "0"))

  /** Encode-cost statistics per (series ∪ chunk): sample count, timestamp
    * bits, value bits, and the value-branch mix (zero-xor / window-reuse /
    * new-window). `tsMsCol` must be epoch-ms; `orderCol` breaks ts ties. */
  def encodeStats(df: DataFrame, seriesCols: Seq[String], tsMsCol: String,
                  orderCol: String, valueCol: String,
                  chunkSize: Int = 120): DataFrame = {
    val sKey = seriesCols.map(col)
    val wS = Window.partitionBy(sKey: _*).orderBy(col(tsMsCol), col(orderCol))
    val seqd = df
      .withColumn("__seq", (row_number().over(wS) - 1).cast("long"))
      .withColumn("__chunk", expr(s"__seq div $chunkSize"))
    val wC = Window.partitionBy(sKey :+ col("__chunk"): _*)
      .orderBy(col(tsMsCol), col(orderCol))
    val t = col(tsMsCol)
    val idx = row_number().over(wC) - 1
    val t1 = lag(t, 1).over(wC)
    val t2 = lag(t, 2).over(wC)
    val delta = t - t1
    val dod = t - t1 * 2 + t2
    val tsBits =
      when(idx === 0, uvarintBits(t * 2))           // zigzag varint t₀
        .when(idx === 1, uvarintBits(delta * 2))    // zigzag varint Δ₁
        .otherwise(
          when(dod === 0, lit(1L))
            .when(dod >= -8191L && dod <= 8192L, lit(16L))
            .when(dod >= -65535L && dod <= 65536L, lit(20L))
            .when(dod >= -524287L && dod <= 524288L, lit(24L))
            .otherwise(lit(68L)))
    val perSample = seqd
      .withColumn("__ts_bits", tsBits)
      .withColumn("__vbits", VectorFunctions.doubleBits(col(valueCol).cast("double")))

    val arr = sort_array(collect_list(
      struct(t.as("t"), col(orderCol).as("o"), col("__vbits").as("b"))))
    val init = struct(lit(0L).as("prev"), lit(255).as("lead"), lit(0).as("trail"),
      lit(0L).as("acc"), lit(0).as("i"),
      lit(0L).as("nzero"), lit(0L).as("nreuse"), lit(0L).as("nnew"))
    def fold(st: Column, x: Column): Column = {
      val b = x.getField("b")
      val xr = st.getField("prev").bitwiseXOR(b)
      val lz = least(lead0(xr), lit(31))
      val tz = trail0(xr)
      val reuse = st.getField("lead") =!= 255 &&
        lz >= st.getField("lead") && tz >= st.getField("trail")
      val stepCost = when(xr === 0, lit(1L))
        .when(reuse,
          lit(2L) + (lit(64) - st.getField("lead") - st.getField("trail")).cast("long"))
        .otherwise(lit(13L) + (lit(64) - lz - tz).cast("long"))
      when(st.getField("i") === 0,
        struct(b.as("prev"), lit(255).as("lead"), lit(0).as("trail"),
          (st.getField("acc") + 64L).as("acc"), lit(1).as("i"),
          lit(0L).as("nzero"), lit(0L).as("nreuse"), lit(0L).as("nnew")))
        .otherwise(
          struct(b.as("prev"),
            when(xr === 0 || reuse, st.getField("lead")).otherwise(lz).as("lead"),
            when(xr === 0 || reuse, st.getField("trail")).otherwise(tz).as("trail"),
            (st.getField("acc") + stepCost).as("acc"),
            (st.getField("i") + 1).as("i"),
            (st.getField("nzero") + when(xr === 0, 1L).otherwise(0L)).as("nzero"),
            (st.getField("nreuse") + when(xr =!= 0 && reuse, 1L).otherwise(0L)).as("nreuse"),
            (st.getField("nnew") + when(xr =!= 0 && !reuse, 1L).otherwise(0L)).as("nnew")))
    }
    perSample
      .groupBy(sKey :+ col("__chunk"): _*)
      .agg(count(lit(1)).as("n_samples"),
        sum(col("__ts_bits")).as("ts_bits"),
        arr.as("__arr"))
      .withColumn("__st", aggregate(col("__arr"), init, fold))
      .select(sKey ++ Seq(col("__chunk").as("chunk"), col("n_samples"), col("ts_bits"),
        col("__st").getField("acc").as("val_bits"),
        col("__st").getField("nzero").as("n_xor_zero"),
        col("__st").getField("nreuse").as("n_window_reuse"),
        col("__st").getField("nnew").as("n_new_window")): _*)
  }
}
