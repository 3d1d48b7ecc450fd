package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

/** The ONE 5-way comparison dispatch shared by every predicate surface
  * (HashQL WHERE and HAVING, Cypher WHERE). Callers coerce the column
  * first — that is the only place the surfaces legitimately differ
  * (dialect WHERE casts to long on a numeric literal, Cypher try_casts so
  * junk attrs drop instead of throwing, HAVING compares output columns
  * as-is) — so the dialect's comparison semantics live here once. */
object Compare {
  def cmp(c: Column, op: String, v: Any): Column = op match {
    case "=" => c === lit(v)
    case "<" => c < lit(v)
    case ">" => c > lit(v)
    case "<=" => c <= lit(v)
    case ">=" => c >= lit(v)
    // three-valued inequality (round-13): NULL input → NULL → row
    // dropped, exactly like every comparison above
    case "<>" => !(c === lit(v))
    case other => throw new IllegalArgumentException(s"unsupported comparison op: $other")
  }
}
