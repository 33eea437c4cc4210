package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{
  FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{Decimal, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-planner integration for manifest-log snapshot tables: a
  * [[FileIndex]] whose `listFiles` prunes AGAINST THE MANIFEST with the
  * data filters the OPTIMIZER pushes down — so
  * `Snapshots.table(spark, t).filter(col("doc_id") < 100)` skips files
  * manifest-side with no explicit predicate plumbing, Spark's own
  * vectorized parquet reader scans the survivors (footer row-group
  * pruning still applies inside them), and `sizeInBytes` feeds the join
  * planner from manifest totals (a small snapshot table broadcasts
  * without a hint). This is the same integration seam Spark's own
  * `InMemoryFileIndex` occupies — except listing comes from the manifest
  * dataset (one small file), never from object-store LIST, and the
  * pruning itself runs as a Spark job so the driver only ever holds the
  * SURVIVING file entries.
  *
  * Lives under `org.apache.spark.sql` because `HadoopFsRelation` /
  * `LogicalRelation` / `Dataset.ofRows` are `private[sql]`-adjacent
  * internals (same reason as [[PredicateBox]] / [[ColumnBridge]]).
  */
object SnapshotRelation {

  private val inf = Double.PositiveInfinity

  private def numLit(e: Expression): Option[Double] = e match {
    case l: Literal => l.value match {
      case n: java.lang.Number => Some(n.doubleValue())
      case d: Decimal => Some(d.toDouble)
      case _ => None
    }
    case _ => None
  }

  private def strLit(e: Expression): Option[String] = e match {
    case l: Literal if l.dataType == StringType =>
      Option(l.value).map(_.asInstanceOf[UTF8String].toString)
    case _ => None
  }

  private def attr(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case x => Seq(x)
  }

  private def mergeNum(
      a: Map[String, (Double, Double)],
      b: Map[String, (Double, Double)]): Map[String, (Double, Double)] =
    (a.keySet ++ b.keySet).map { k =>
      val (alo, ahi) = a.getOrElse(k, (-inf, inf))
      val (blo, bhi) = b.getOrElse(k, (-inf, inf))
      k -> (math.max(alo, blo), math.min(ahi, bhi))
    }.toMap

  private def mergeStr(
      a: Map[String, (Option[String], Option[String])],
      b: Map[String, (Option[String], Option[String])])
      : Map[String, (Option[String], Option[String])] =
    (a.keySet ++ b.keySet).map { k =>
      val (alo, ahi) = a.getOrElse(k, (None, None))
      val (blo, bhi) = b.getOrElse(k, (None, None))
      val lo = (alo ++ blo).reduceOption((x, y) => if (x >= y) x else y)
      val hi = (ahi ++ bhi).reduceOption((x, y) => if (x <= y) x else y)
      k -> ((lo, hi))
    }.toMap

  private def asciiOnly(ss: Seq[String]): Boolean = ss.forall(_.forall(_ < 128))

  /** Conservative per-column numeric and string boxes from the optimizer's
    * pushed data filters (already conjunct-split; nested ANDs re-split).
    * Unrecognized atoms contribute no constraint — pruning stays sound.
    * The Catalyst-`Expression` twin of [[PredicateBox]] (which walks the
    * public Column IR); this one sees what the PLANNER pushed, after
    * column resolution and constant folding.
    */
  private[graft] def boxes(filters: Seq[Expression])
      : (Map[String, (Double, Double)], Map[String, (Option[String], Option[String])]) = {
    var num = Map.empty[String, (Double, Double)]
    var str = Map.empty[String, (Option[String], Option[String])]
    filters.flatMap(splitConjuncts).foreach {
      case EqualTo(a, l) if attr(a).isDefined =>
        numLit(l).foreach(v => num = mergeNum(num, Map(attr(a).get -> ((v, v)))))
        strLit(l).foreach(v => str = mergeStr(str, Map(attr(a).get -> ((Some(v), Some(v))))))
      case EqualTo(l, a) if attr(a).isDefined =>
        numLit(l).foreach(v => num = mergeNum(num, Map(attr(a).get -> ((v, v)))))
        strLit(l).foreach(v => str = mergeStr(str, Map(attr(a).get -> ((Some(v), Some(v))))))
      case EqualNullSafe(a, l) if attr(a).isDefined && (numLit(l) ++ strLit(l)).nonEmpty =>
        numLit(l).foreach(v => num = mergeNum(num, Map(attr(a).get -> ((v, v)))))
        strLit(l).foreach(v => str = mergeStr(str, Map(attr(a).get -> ((Some(v), Some(v))))))
      case GreaterThan(a, l) if attr(a).isDefined =>
        numLit(l).foreach(v => num = mergeNum(num, Map(attr(a).get -> ((v, inf)))))
        strLit(l).foreach(v => str = mergeStr(str, Map(attr(a).get -> ((Some(v), None)))))
      case GreaterThanOrEqual(a, l) if attr(a).isDefined =>
        numLit(l).foreach(v => num = mergeNum(num, Map(attr(a).get -> ((v, inf)))))
        strLit(l).foreach(v => str = mergeStr(str, Map(attr(a).get -> ((Some(v), None)))))
      case LessThan(a, l) if attr(a).isDefined =>
        numLit(l).foreach(v => num = mergeNum(num, Map(attr(a).get -> ((-inf, v)))))
        strLit(l).foreach(v => str = mergeStr(str, Map(attr(a).get -> ((None, Some(v))))))
      case LessThanOrEqual(a, l) if attr(a).isDefined =>
        numLit(l).foreach(v => num = mergeNum(num, Map(attr(a).get -> ((-inf, v)))))
        strLit(l).foreach(v => str = mergeStr(str, Map(attr(a).get -> ((None, Some(v))))))
      // flipped comparisons: lit <op> attr
      case GreaterThan(l, a) if attr(a).isDefined =>
        numLit(l).foreach(v => num = mergeNum(num, Map(attr(a).get -> ((-inf, v)))))
        strLit(l).foreach(v => str = mergeStr(str, Map(attr(a).get -> ((None, Some(v))))))
      case GreaterThanOrEqual(l, a) if attr(a).isDefined =>
        numLit(l).foreach(v => num = mergeNum(num, Map(attr(a).get -> ((-inf, v)))))
        strLit(l).foreach(v => str = mergeStr(str, Map(attr(a).get -> ((None, Some(v))))))
      case LessThan(l, a) if attr(a).isDefined =>
        numLit(l).foreach(v => num = mergeNum(num, Map(attr(a).get -> ((v, inf)))))
        strLit(l).foreach(v => str = mergeStr(str, Map(attr(a).get -> ((Some(v), None)))))
      case LessThanOrEqual(l, a) if attr(a).isDefined =>
        numLit(l).foreach(v => num = mergeNum(num, Map(attr(a).get -> ((v, inf)))))
        strLit(l).foreach(v => str = mergeStr(str, Map(attr(a).get -> ((Some(v), None)))))
      case In(a, vs) if attr(a).isDefined && vs.nonEmpty =>
        val nums = vs.map(numLit)
        if (nums.forall(_.isDefined))
          num = mergeNum(num,
            Map(attr(a).get -> ((nums.flatten.min, nums.flatten.max))))
        else {
          val strs = vs.map(strLit)
          // JVM UTF-16 min/max can disagree with Spark's UTF-8 ordering on
          // non-ASCII values — span only ASCII-pure IN lists
          if (strs.forall(_.isDefined) && asciiOnly(strs.flatten))
            str = mergeStr(str,
              Map(attr(a).get -> ((Some(strs.flatten.min), Some(strs.flatten.max)))))
        }
      case _ => // IsNotNull, functions, ORs, casts — no constraint (sound)
    }
    (num, str)
  }

  /** Manifest-backed [[FileIndex]]: `prune(numBox, strBox)` runs the
    * manifest-stats skip as a Spark job and returns the SURVIVORS'
    * (absolute path, bytes) — the only thing the driver ever holds.
    */
  final class SnapshotFileIndex(
      tablePath: String,
      totalBytes: Long,
      allFiles: () => Array[(String, Long)],
      prune: (Map[String, (Double, Double)],
        Map[String, (Option[String], Option[String])]) => Array[(String, Long)])
    extends FileIndex {

    override def rootPaths: Seq[Path] = Seq(new Path(tablePath))
    override def partitionSchema: StructType = StructType(Nil)
    override def refresh(): Unit = ()
    override def sizeInBytes: Long = totalBytes
    override def inputFiles: Array[String] = allFiles().map(_._1)

    private def status(pathAndBytes: (String, Long)): FileStatus =
      new FileStatus(pathAndBytes._2, false, 1, 128L * 1024 * 1024, 0L,
        new Path(pathAndBytes._1))

    override def listFiles(
        partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
      val (numBox, strBox) = boxes(dataFilters)
      val kept =
        if (numBox.isEmpty && strBox.isEmpty) allFiles()
        else prune(numBox, strBox)
      Seq(PartitionDirectory(InternalRow.empty, kept.map(status)))
    }
  }

  /** Assemble the planner-integrated DataFrame over a snapshot version's
    * parquet files (deletion vectors are the CALLER's layer — see
    * `Snapshots.table`).
    */
  def frame(
      spark: SparkSession,
      tablePath: String,
      schema: StructType,
      totalBytes: Long,
      allFiles: () => Array[(String, Long)],
      prune: (Map[String, (Double, Double)],
        Map[String, (Option[String], Option[String])]) => Array[(String, Long)]): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val index = new SnapshotFileIndex(tablePath, totalBytes, allFiles, prune)
    val rel = HadoopFsRelation(
      index, StructType(Nil), schema, None, new ParquetFileFormat, Map.empty[String, String])(cs)
    org.apache.spark.sql.classic.Dataset.ofRows(cs, LogicalRelation(rel))
  }
}
