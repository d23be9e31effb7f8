package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for dataset curation —
  * train/test splits and down-sampling that are (a) stable across
  * runs, cluster sizes, and partitionings (a row's fate depends only
  * on its id, never on rng state or task order — re-running the
  * pipeline or adding executors cannot reshuffle the split), and
  * (b) exactly reproducible by any engine with md5 (the DuckDB
  * oracle checks them bit-for-bit). Spark's own `sample`/`sampleBy`
  * are rng-per-partition: cheap but neither stable under
  * repartitioning nor cross-engine checkable.
  *
  * All rowwise, whole-stage codegen, no shuffle.
  */
object Sampling {

  /** Uniform [0, 1) from an md5 hex string: first 8 hex chars scaled
    * by 2^-32 — every step exact. The single source of the
    * hash-to-unit-interval contract (Multimodal.featureExtract,
    * Curation.shuffleShards, and the oracles share it); take this
    * overload when the hex is already materialized in a column. */
  def unitFromMd5Hex(hex: Column): Column =
    conv(substring(hex, 1, 8), 16, 10).cast("double") / lit(4294967296.0)

  /** Uniform [0, 1) from any string column (hashes, then scales). */
  def unitFromMd5(s: Column): Column = unitFromMd5Hex(md5(s))

  /** Uniform [0, 1) from an id (its decimal string form). */
  def hashUnit(id: Column): Column = unitFromMd5(id.cast("string"))

  /** Keep ≈ rate of rows, chosen by id hash. Deterministic: the same
    * id is kept at every rate ≥ its hash point (nested samples —
    * a 1% sample is a subset of the 10% sample). */
  def deterministicSample(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.filter(hashUnit(col(idCol)) < rate)
  }

  /** Adds a split column: 'test' for ≈ testFrac of rows, else
    * 'train'. Contamination-safe: a row can never change sides
    * between runs, and duplicate ids land on the same side. */
  def trainTestSplit(df: DataFrame, idCol: String, testFrac: Double): DataFrame = {
    require(testFrac >= 0.0 && testFrac <= 1.0, s"testFrac must be in [0,1], got $testFrac")
    require(!df.columns.contains("split"),
      "input already has a 'split' column — silently replacing an existing " +
        "assignment would defeat the contamination-safety contract")
    df.withColumn("split",
      when(hashUnit(col(idCol)) < testFrac, "test").otherwise("train"))
  }

  /** Per-stratum deterministic sampling: each stratum value keeps its
    * own rate (defaultRate otherwise) — the curation knob for
    * rebalancing a corpus (e.g. down-sample the dominant language). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rates must be in [0,1], got $r"))
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (v, r)) =>
      when(col(stratumCol) === v, lit(r)).otherwise(acc)
    }
    df.filter(hashUnit(col(idCol)) < rateCol)
  }
}
