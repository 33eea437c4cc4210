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
}
