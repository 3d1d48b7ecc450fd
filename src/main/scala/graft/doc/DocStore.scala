package graft.doc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document store (SURVEY §2.1 S9/S10, §2.2 P2, §2.6 F3/F4).
  *
  * The reference shreds JSON documents into flattened keyvalues plus a
  * per-cluster path registry (/root/reference/server.py:196-331) and
  * re-hydrates them on read (client.py:66-143). On Spark none of that
  * machinery is needed: documents are native nested rows
  * (StructType/ArrayType), hydration is `to_json`, shredding is
  * `spark.read.json` schema inference. What we keep from the reference is
  * its *addressing syntax* — `people.~hobbies[]~name`
  * (README.md:123-145) — translated here into explode/getField chains.
  */
object DocStore {

  /** Save path (S9): raw JSON strings → nested rows, schema inferred —
    * the Spark-native equivalent of the reference's shredder. Pass
    * `docSchema` to parse against a collection's established schema (the
    * reference keeps a per-collection path registry, server.py:289-331;
    * here that registry IS the collection's StructType). */
  def fromJson(spark: SparkSession, idAndJson: DataFrame,
               docSchema: Option[org.apache.spark.sql.types.DataType] = None): DataFrame = {
    import spark.implicits._
    val schema = docSchema.getOrElse {
      spark.read.json(idAndJson.select(col("json")).as[String]).schema
    }
    idAndJson.withColumn("doc", from_json(col("json"), schema)).drop("json")
  }

  /** Read path (S10): hydrate a nested doc column back to a JSON string. */
  def hydrate(docs: DataFrame, docCol: String = "doc"): DataFrame =
    docs.withColumn("json", to_json(col(docCol)))

  private final case class Seg(name: String, isArray: Boolean,
                               index: Option[Int] = None)

  /** `x` plain field · `x[]` every element (explodes / exists) · `x[n]`
    * the n-th element, 0-based (growth beyond the reference's []-only
    * addressing, README.md:100-145): a pure `element_at` — no explode,
    * NULL past the end, JSON-path-style. */
  private def parse(path: String): Seq[Seg] =
    path.split("~").filter(_.nonEmpty).toSeq.map { s =>
      if (s.endsWith("[]")) Seg(s.dropRight(2), isArray = true)
      else if (s.endsWith("]") && s.contains("[")) {
        val at = s.lastIndexOf('[')
        val idx = s.substring(at + 1, s.length - 1)
        require(idx.matches("[0-9]+"), s"bad array index in path segment: $s")
        Seg(s.substring(0, at), isArray = false, index = Some(idx.toInt))
      }
      else Seg(s, isArray = false)
    }

  /** P2 doc-path projection: `select(docs, "doc", "~orders[]~o_orderkey")`
    * emits one row per addressed leaf (array segments explode). Returns the
    * input columns (minus the doc) plus the leaf as `as`. */
  def selectPath(docs: DataFrame, docCol: String, path: String, as: String): DataFrame =
    selectPaths(docs, docCol, Seq(path -> as))

  /** Multi-path projection (the reference's flattened multi-path row dicts,
    * README.md:134-145): every path lands as one output column. Paths
    * addressing the SAME array share one explode, so their leaves stay
    * POSITIONALLY ALIGNED — `~orders[]~o_orderkey` and
    * `~orders[]~o_totalprice` in one statement emit one row per order with
    * that order's key AND price (not a self cross-product). Paths through
    * DIFFERENT arrays compose explodes, i.e. cross-product semantics —
    * the relational meaning of addressing two independent nested
    * collections in one statement. */
  def selectPaths(docs: DataFrame, docCol: String,
                  paths: Seq[(String, String)]): DataFrame = {
    val keep = docs.columns.filter(_ != docCol).toSeq
    var df = docs
    var fresh = 0
    // one explode per distinct array PREFIX (all segments up to and
    // including the array), shared across paths — the alignment guarantee
    val exploded = scala.collection.mutable.Map.empty[Seq[String], Column]
    def resolve(path: String): Column = {
      var cur: Column = col(docCol)
      var prefix = List.empty[String]
      parse(path).foreach { seg =>
        if (seg.isArray) {
          prefix = prefix :+ s"${seg.name}[]"
          val parent = cur
          cur = exploded.getOrElseUpdate(prefix, {
            fresh += 1
            val tmp = s"__seg$fresh"
            df = df.withColumn(tmp, explode(parent.getField(seg.name)))
            col(tmp)
          })
        } else if (seg.index.isDefined) {
          // indexed element: scan-side element_at (1-based), no explode
          prefix = prefix :+ s"${seg.name}[${seg.index.get}]"
          cur = try_element_at(cur.getField(seg.name), lit(seg.index.get + 1))
        } else {
          prefix = prefix :+ seg.name
          cur = cur.getField(seg.name)
        }
      }
      cur
    }
    val leaves = paths.map { case (p, as) => resolve(p).as(as) }
    df.select(keep.map(col) ++ leaves: _*)
  }

  /** Doc-path existence predicate: `pathExists(docs, "doc",
    * "~orders[]~o_totalprice", _ > 300000)` — true if ANY addressed leaf
    * matches. Uses higher-order `exists` (codegen'd) instead of
    * explode+distinct, so the filter stays scan-side. Supports one array
    * segment (the reference's own examples never nest arrays). */
  def pathMatches(docCol: Column, path: String, pred: Column => Column): Column = {
    val segs = parse(path)
    def step(c: Column, s: Seg): Column =
      if (s.index.isDefined) try_element_at(c.getField(s.name), lit(s.index.get + 1))
      else c.getField(s.name)
    val arrIdx = segs.indexWhere(_.isArray)
    if (arrIdx < 0)
      // pure scalar chain (plain and/or INDEXED segments): the predicate
      // applies to the single addressed leaf; NULL (missing field, index
      // past the end) fails the filter like any NULL comparison
      pred(segs.foldLeft(docCol)(step))
    else {
      val arr = segs.take(arrIdx).foldLeft(docCol)(step)
        .getField(segs(arrIdx).name)
      val post = segs.drop(arrIdx + 1)
      exists(arr, e => pred(post.foldLeft(e)(step)))
    }
  }
}
