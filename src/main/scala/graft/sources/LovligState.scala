package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions

/** S1: the CDC source — scan a lovlig `state.json` and flatten
  * `raw_datasets.*.files.*` into file records (reference `lovlig.py:70-136`;
  * state shape per fixture `tests/unit/lovlig_test.py:23-43`).
  *
  * One scan + three filters replaces the reference's three list-building
  * variants (changed 78-106, all 108-136, removed 138-153).
  */
object LovligState {

  /** Explicit schema — never inferred (SURVEY §1.3): the state document is
    * `{"raw_datasets": {dataset: {"files": {relpath: {"status","sha256"}}}}}`.
    */
  val stateSchema: StructType = StructType(Seq(
    StructField(
      "raw_datasets",
      MapType(
        StringType,
        StructType(Seq(
          StructField(
            "files",
            MapType(
              StringType,
              StructType(Seq(
                StructField("status", StringType),
                StructField("sha256", StringType)
              ))
            )
          )
        ))
      )
    )
  ))

  /** Flatten the nested maps into one row per file:
    * (dataset, relpath, status, hash, docId, path).
    *
    * docId = stem of relpath; path = extractedDir / datasetDir / relpath with
    * datasetDir = dataset minus `.tar.bz2` (reference `lovlig.py:88,96`).
    */
  def scan(spark: SparkSession, statePath: String, extractedDir: String): DataFrame =
    spark.read.schema(stateSchema).option("multiLine", "true").json(statePath)
      .select(explode(col("raw_datasets")).as(Seq("dataset", "ds")))
      .select(col("dataset"), explode(col("ds.files")).as(Seq("relpath", "f")))
      .select(
        col("dataset"),
        col("relpath"),
        col("f.status").as("status"),
        col("f.sha256").as("hash"),
        TextFunctions.pathStem(col("relpath")).as("docId"),
        concat_ws("/", lit(extractedDir), TextFunctions.datasetDir(col("dataset")), col("relpath"))
          .as("path")
      )

  /** F1: files to process (reference `lovlig.py:93`). */
  def changedFiles(scanned: DataFrame): DataFrame =
    scanned.filter(col("status").isin("added", "modified"))

  /** F2: all live files (reference `lovlig.py:121-122`). */
  def liveFiles(scanned: DataFrame): DataFrame =
    scanned.filter(col("status") =!= "removed")

  /** F3: tombstones (reference `lovlig.py:149`). */
  def removedFiles(scanned: DataFrame): DataFrame =
    scanned.filter(col("status") === "removed")
}
