package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.{
  ColumnNode, Literal => NodeLiteral, UnresolvedAttribute => NodeAttr,
  UnresolvedFunction => NodeFn
}

/** Conservative numeric bounding-box extraction from a `Column` predicate,
  * by walking its `ColumnNode` tree (the Spark 4 Column IR): only top-level
  * conjunctions of `attr (=|<|<=|>|>=) numeric-literal` contribute;
  * anything else (OR, function calls, non-numeric literals) yields no
  * constraint for its subtree — a consumer that prunes with the box then
  * keeps the file/partition, which is always sound. This is the
  * manifest-evaluation half of what Catalyst's
  * `DataSourceStrategy.translateFilter` does for source pushdown; it lives
  * under `org.apache.spark.sql` only because the ColumnNode ADT is
  * `private[sql]` (same reason as [[ColumnBridge]]).
  */
object PredicateBox {

  private val inf = Double.PositiveInfinity

  /** Per-column `[lo, hi]` bounds implied by `c` (missing column = no
    * constraint). `predicateBox(a >= 3 && a < 7 && b === 5)` →
    * `Map(a -> (3, 7), b -> (5, 5))`; an OR yields `Map.empty`.
    */
  def extract(c: Column): Map[String, (Double, Double)] = walk(c.node)

  private def name(n: ColumnNode): Option[String] = n match {
    case a: NodeAttr => Some(a.nameParts.last)
    case _ => None
  }

  private def num(n: ColumnNode): Option[Double] = n match {
    case l: NodeLiteral => l.value match {
      case v: java.lang.Number => Some(v.doubleValue())
      case _ => None
    }
    case _ => None
  }

  private def merge(
      a: Map[String, (Double, Double)],
      b: Map[String, (Double, Double)]): Map[String, (Double, Double)] =
    (a.keySet ++ b.keySet).map { k =>
      val (alo, ahi) = a.getOrElse(k, (-inf, inf))
      val (blo, bhi) = b.getOrElse(k, (-inf, inf))
      k -> (math.max(alo, blo), math.min(ahi, bhi))
    }.toMap

  /** Bounds for `attr <op> v`; strict and non-strict bounds collapse to the
    * closed interval (conservative for pruning).
    */
  private def range(op: String, v: Double): (Double, Double) = op match {
    case "=" | "==" => (v, v)
    case ">" | ">=" => (v, inf)
    case "<" | "<=" => (-inf, v)
    case _ => (-inf, inf)
  }

  private def flip(op: String): String = op match {
    case ">" => "<"; case ">=" => "<="; case "<" => ">"; case "<=" => ">="
    case other => other
  }

  private val cmps = Set("=", "==", ">", ">=", "<", "<=")

  private def walk(n: ColumnNode): Map[String, (Double, Double)] = n match {
    case f: NodeFn if f.functionName == "and" && f.arguments.size == 2 =>
      merge(walk(f.arguments.head), walk(f.arguments(1)))
    // attr IN (v1..vk) -> [min, max] of the list: the span keeps any file
    // whose range touches it (maybe more than the exact values — sound)
    case f: NodeFn if f.functionName == "in" && f.arguments.size >= 2 =>
      (name(f.arguments.head), f.arguments.tail.map(num)) match {
        case (Some(a), vs) if vs.forall(_.isDefined) =>
          val xs = vs.flatten
          Map(a -> ((xs.min, xs.max)))
        case _ => Map.empty
      }
    case f: NodeFn if cmps.contains(f.functionName) && f.arguments.size == 2 =>
      val l = f.arguments.head
      val r = f.arguments(1)
      (name(l), num(r), name(r), num(l)) match {
        case (Some(a), Some(v), _, _) => Map(a -> range(f.functionName, v))
        case (_, _, Some(a), Some(v)) => Map(a -> range(flip(f.functionName), v))
        case _ => Map.empty
      }
    case _ => Map.empty
  }

  /** Per-column string `[lo, hi]` bounds implied by `c` — the string twin
    * of [[extract]], with `None` as the open end. Only conjunctions of
    * `attr (=|<|<=|>|>=) string-literal` contribute; everything else
    * yields no constraint (sound for pruning). Comparisons downstream run
    * in Spark SQL (binary collation), matching the min/max the stats
    * writer computed with the same engine.
    */
  def extractStr(c: Column): Map[String, (Option[String], Option[String])] = walkStr(c.node)

  private def str(n: ColumnNode): Option[String] = n match {
    case l: NodeLiteral => l.value match {
      case v: String => Some(v)
      case v: org.apache.spark.unsafe.types.UTF8String => Some(v.toString)
      case _ => None
    }
    case _ => None
  }

  private def rangeStr(op: String, v: String): (Option[String], Option[String]) = op match {
    case "=" | "==" => (Some(v), Some(v))
    case ">" | ">=" => (Some(v), None)
    case "<" | "<=" => (None, Some(v))
    case _ => (None, None)
  }

  private def mergeStr(
      a: Map[String, (Option[String], Option[String])],
      b: Map[String, (Option[String], Option[String])]): Map[String, (Option[String], Option[String])] =
    (a.keySet ++ b.keySet).map { k =>
      val (alo, ahi) = a.getOrElse(k, (None, None))
      val (blo, bhi) = b.getOrElse(k, (None, None))
      val lo = (alo.toSeq ++ blo.toSeq).sorted.lastOption
      val hi = (ahi.toSeq ++ bhi.toSeq).sorted.headOption
      k -> ((lo, hi))
    }.toMap

  private def walkStr(n: ColumnNode): Map[String, (Option[String], Option[String])] = n match {
    case f: NodeFn if f.functionName == "and" && f.arguments.size == 2 =>
      mergeStr(walkStr(f.arguments.head), walkStr(f.arguments(1)))
    // ASCII-only lists: JVM min/max ordering matches Spark's UTF-8 binary
    // ordering there; a non-ASCII value could make the JVM-chosen span
    // unsound, so such a list contributes no constraint
    case f: NodeFn if f.functionName == "in" && f.arguments.size >= 2 =>
      (name(f.arguments.head), f.arguments.tail.map(str)) match {
        case (Some(a), vs) if vs.forall(_.isDefined) &&
            vs.flatten.forall(_.forall(_ < 128)) =>
          val xs = vs.flatten
          Map(a -> ((Some(xs.min), Some(xs.max))))
        case _ => Map.empty
      }
    case f: NodeFn if cmps.contains(f.functionName) && f.arguments.size == 2 =>
      val l = f.arguments.head
      val r = f.arguments(1)
      (name(l), str(r), name(r), str(l)) match {
        case (Some(a), Some(v), _, _) => Map(a -> rangeStr(f.functionName, v))
        case (_, _, Some(a), Some(v)) => Map(a -> rangeStr(flip(f.functionName), v))
        case _ => Map.empty
      }
    case _ => Map.empty
  }
}
