package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.SkewJoin

/** Scale-posture mechanics: salted skew joins preserve semantics, and
  * bucketed tables co-locate joins (no shuffle exchange in the plan). */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join ≡ plain join on a skewed key distribution") {
    // skew: 80% of left rows share one key
    val left = (1 to 5000).map(i => (if (i % 5 != 0) 1L else i.toLong, s"v$i"))
      .toDF("k", "payload")
    val right = (1L to 1000L).map(k => (k, s"dim$k")).toDF("rk", "attr")
    val plain = left.join(right, left("k") === right("rk"))
      .select("k", "payload", "attr").as[(Long, String, String)].collect().toSet
    val salted = SkewJoin.saltedJoin(left, right, "k", "rk", salts = 8)
      .select("k", "payload", "attr").as[(Long, String, String)].collect().toSet
    assert(salted == plain)
  }

  test("blocked embeddingNearDup plans equi-joins only — no cartesian, no corpus on the driver") {
    val emb = Tables.t(spark, sf, "embeddings")
    val blocked = graft.llm.Similarity.embeddingNearDup(
      emb, 0.4, "vec_id", "embedding",
      broadcastMaxRows = 0L, bands = 8, planesPerBand = 8)
    val plan = blocked.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs fallback leaked into the blocked path:\n$plan")
    // candidate generation + verify are hash/sort-merge equi-joins
    assert(plan.contains("Join"), s"no join in blocked plan:\n$plan")
    blocked.count() // and it executes
  }

  test("packChunks has no single-partition stage; sampling has no exchange") {
    val docs = Tables.t(spark, sf, "documents")
    // the naive window formulation funnels the corpus through ONE task;
    // the operator's range-partition + offsets shape must not
    val packed = graft.llm.Packing.packChunks(docs, "text", "doc_id", 512)
    val packPlan = packed.queryExecution.executedPlan.toString
    assert(!packPlan.contains("Exchange SinglePartition"),
      s"packChunks funnels through one partition:\n$packPlan")
    // deterministic sampling is a pure scan-side filter — no shuffle at all
    val sampled = graft.llm.Sampling.stratifiedSample(
      Tables.t(spark, sf, "lineitem"), "l_returnflag", "l_orderkey",
      Map("A" -> 50, "N" -> 200, "R" -> 500))
    val samplePlan = sampled.queryExecution.executedPlan.toString
    assert(!samplePlan.contains("Exchange"),
      s"sampling shuffles:\n$samplePlan")
  }

  test("PQ serving plans: flat ADC has no join at all; IVF-PQ is one broadcast equi-join") {
    val emb = Tables.t(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    // flat PQ: encode scan + broadcast LUTs — candidate generation is a
    // flatMap, so there must be NO join operator anywhere in the plan
    val pq = graft.llm.Similarity.pqTopK(emb, queries, 5, m = 8, ksub = 16, iters = 1)
    val pqPlan = pq.queryExecution.executedPlan.toString
    assert(!pqPlan.contains("Join"), s"flat ADC scan plans a join:\n$pqPlan")
    // IVF-PQ: candidates come from ONE broadcast equi-join on the probed
    // list ids — never a cartesian, never a shuffle of the coded corpus
    // beyond the ranking window
    val ivfpq = graft.llm.Similarity.ivfPqTopK(emb, queries, 5,
      nlist = 16, nprobe = 4, m = 8, ksub = 16, iters = 1)
    val ivfpqPlan = ivfpq.queryExecution.executedPlan.toString
    assert(ivfpqPlan.contains("BroadcastHashJoin"),
      s"probe join is not broadcast:\n$ivfpqPlan")
    assert(!ivfpqPlan.contains("CartesianProduct") &&
      !ivfpqPlan.contains("BroadcastNestedLoopJoin"),
      s"ivfPqTopK plans a cross product:\n$ivfpqPlan")
    ivfpq.count()
  }

  test("graph analytics plans: pageRank shuffles only on join/agg keys, cc never crosses") {
    val g = graft.graph.PropertyGraph.fromTpch(
      Tables.t(spark, sf, "customer"), Tables.t(spark, sf, "nation"),
      Tables.t(spark, sf, "region"), Tables.t(spark, sf, "supplier"))
    val pr = g.pageRank(iters = 2)
    val prPlan = pr.queryExecution.executedPlan.toString
    assert(!prPlan.contains("CartesianProduct") &&
      !prPlan.contains("BroadcastNestedLoopJoin"),
      s"pageRank plans a cross product:\n$prPlan")
    val cc = g.connectedComponents()
    val ccPlan = cc.queryExecution.executedPlan.toString
    assert(!ccPlan.contains("CartesianProduct") &&
      !ccPlan.contains("BroadcastNestedLoopJoin"),
      s"connectedComponents plans a cross product:\n$ccPlan")
    // triangle counting: wedge build + closure are equi-joins on node ids
    val tri = g.triangleCounts()
    val triPlan = tri.queryExecution.executedPlan.toString
    assert(!triPlan.contains("CartesianProduct") &&
      !triPlan.contains("BroadcastNestedLoopJoin"),
      s"triangleCounts plans a cross product:\n$triPlan")
  }

  test("cypher aggregates plan partial aggregation below the exchange") {
    val g = graft.graph.PropertyGraph.fromTpch(
      Tables.t(spark, sf, "customer"), Tables.t(spark, sf, "nation"),
      Tables.t(spark, sf, "region"), Tables.t(spark, sf, "supplier"))
    val agg = g.query(
      "match (c:Customer)-[:IN]->(n:Nation) return n, count(*), sum(c.c_nationkey)")
    val plan = agg.queryExecution.executedPlan.toString
    // two HashAggregates per logical agg (partial below, final above the
    // exchange) — map-side combine is what keeps a skewed group from
    // funneling its raw bindings through one reducer
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"no partial aggregation in cypher agg plan:\n$plan")
    agg.count()
  }

  test("span/line dedup and semanticDedup plan equi-joins only — never a cross product") {
    val docs = Tables.t(spark, sf, "documents")
    val spans = graft.llm.Dedup.stripDuplicateSpans(docs, "text", "doc_id", 8)
    val spanPlan = spans.queryExecution.executedPlan.toString
    assert(!spanPlan.contains("CartesianProduct") &&
      !spanPlan.contains("BroadcastNestedLoopJoin"),
      s"stripDuplicateSpans plans a cross product:\n$spanPlan")

    val lines = graft.llm.Dedup.lineDedup(docs, "text", "doc_id", 50)
    val linePlan = lines.queryExecution.executedPlan.toString
    assert(!linePlan.contains("CartesianProduct") &&
      !linePlan.contains("BroadcastNestedLoopJoin"),
      s"lineDedup plans a cross product:\n$linePlan")

    // semanticDedup's pairwise stage must be the list-id equi-join (the
    // corpus cross product never appears); inspect the pre-clusters pairs
    // frame shape by rebuilding it the way the operator does
    val emb = Tables.t(spark, sf, "embeddings")
    val kept = graft.llm.Similarity.semanticDedup(emb, 0.4, nlist = 16, iters = 0)
    val keptPlan = kept.queryExecution.executedPlan.toString
    assert(!keptPlan.contains("CartesianProduct") &&
      !keptPlan.contains("BroadcastNestedLoopJoin"),
      s"semanticDedup plans a cross product:\n$keptPlan")
    kept.count() // and it executes
  }

  test("tokenBudgetSample admits via the distributed prefix sum — no Window, window-equivalent") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.t(spark, sf, "documents")
    val in = docs.select(col("doc_id"),
      graft.llm.TextAnalysis.langId(col("text")).as("lang"),
      graft.llm.TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
    val budgets = Map("en" -> 3000L, "fr" -> 1000L, "de" -> 500L)
    val mixed = graft.llm.Sampling.tokenBudgetSample(
      in, "lang", "doc_id", "n", budgets)
    // the single-task-per-stratum window must not survive anywhere in the
    // plan — the admission total is the range-partitioned two-phase prefix
    // sum (stratumCumSum), which also never funnels into one partition
    val plan = mixed.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"per-stratum window survived:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"admission funnels through one partition:\n$plan")
    // exact equivalence vs the declarative window formulation it replaced
    val w = Window.partitionBy(col("lang"))
      .orderBy(graft.llm.Sampling.arithBucket(col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = budgets.foldLeft(lit(0L)) {
      case (els, (k, b)) => when(col("lang") === k, lit(b)).otherwise(els) }
    val expected = in.withColumn("cum", sum(col("n")).over(w))
      .filter(col("cum") <= budget).select("doc_id")
      .as[Long].collect().toSet
    assert(mixed.select("doc_id").as[Long].collect().toSet == expected)
  }

  test("epochShuffle assigns positions distributed — no Window, window-equivalent per seed") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.t(spark, sf, "documents").select("doc_id")
    val shuffled = graft.llm.Sampling.epochShuffle(docs, "doc_id", seed = 42L)
    val plan = shuffled.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global-order window survived:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"position assignment funnels through one partition:\n$plan")
    // bit-for-bit the row_number formulation it replaces
    val w = Window.orderBy(
      graft.llm.Sampling.epochOrd(col("doc_id"), 42L), col("doc_id"))
    val expected = docs.withColumn("epoch_pos", row_number().over(w).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(shuffled.as[(Long, Long)].collect().toMap == expected)
    // different seed ⇒ different permutation (the multi-epoch point)
    val other = graft.llm.Sampling.epochShuffle(docs, "doc_id", seed = 43L)
      .as[(Long, Long)].collect().toMap
    assert(other != expected)
  }

  test("pinPartitioning upgrades to a reliable checkpoint when the session has a checkpoint dir") {
    val docs = Tables.t(spark, sf, "documents").select("doc_id")
    val before = graft.llm.Sampling.epochShuffle(docs, "doc_id", seed = 5L)
      .as[(Long, Long)].collect().toMap
    val packBefore = graft.llm.Packing.packChunks(
      Tables.t(spark, sf, "documents"), "text", "doc_id", budget = 512)
      .as[(Long, Long, Long)].collect().toSet
    // setting the dir flips every subsequent prefix-sum pin in this shared
    // session from localCheckpoint to reliable checkpoint() — correct
    // either way, but slower and order-dependent for the OTHER suites
    // sharing this JVM, so the dir is restored to unset afterwards
    // (SparkContext has no public unsetter; the reflective reset below is
    // test-only)
    val ckpt = java.nio.file.Files.createTempDirectory("reliable_ck").toString
    spark.sparkContext.setCheckpointDir(ckpt)
    try {
      val after = graft.llm.Sampling.epochShuffle(docs, "doc_id", seed = 5L)
        .as[(Long, Long)].collect().toMap
      assert(after == before)
      val packAfter = graft.llm.Packing.packChunks(
        Tables.t(spark, sf, "documents"), "text", "doc_id", budget = 512)
        .as[(Long, Long, Long)].collect().toSet
      assert(packAfter == packBefore)
      // the reliable checkpoint actually landed RDD files in the dir
      def files(f: java.io.File): Iterator[java.io.File] =
        Iterator(f) ++ Option(f.listFiles()).iterator.flatten.flatMap(files)
      assert(files(new java.io.File(ckpt)).count(_.isFile) > 0,
        "no reliable checkpoint files written")
    } finally {
      val f = spark.sparkContext.getClass.getDeclaredFields
        .find(_.getName.endsWith("checkpointDir"))
        .getOrElse(fail("SparkContext.checkpointDir field not found"))
      f.setAccessible(true)
      f.set(spark.sparkContext, None)
      assert(spark.sparkContext.getCheckpointDir.isEmpty,
        "checkpoint dir not restored for the shared session")
    }
  }

  test("snapshot diff moves digests through one join; temperatureSample windows on the stratum") {
    val docs = Tables.t(spark, sf, "documents")
    val v2 = docs.filter(col("doc_id") % 17 =!= 0).select(col("doc_id"), col("text"))
    val d = graft.llm.Snapshot.diff(
      docs.select(col("doc_id"), col("text")), v2, "doc_id", Seq("text"))
    val dPlan = d.queryExecution.executedPlan.toString
    assert(!dPlan.contains("CartesianProduct") &&
      !dPlan.contains("BroadcastNestedLoopJoin"),
      s"diff is not an equi-join:\n$dPlan")
    // the md5 digest must be computed BELOW the shuffle (between the
    // Exchange and its FileScan in the printed tree), so the exchange
    // carries (id, 32-char digest), never the documents
    val afterExchange = dPlan.substring(dPlan.indexOf("Exchange hashpartitioning"))
    val beforeScan = afterExchange.substring(0, afterExchange.indexOf("FileScan"))
    assert(beforeScan.contains("md5"),
      s"digest not computed scan-side below the exchange:\n$dPlan")

    // temperatureSample: the admission rank is the same distributed prefix
    // sum (over value 1) — no Window node, no single-partition funnel
    val t = graft.llm.Sampling.temperatureSample(
      docs.select(col("doc_id"), col("lang")), "lang", "doc_id", 200L)
    val tPlan = t.queryExecution.executedPlan.toString
    assert(!tPlan.contains("Window"),
      s"per-stratum admission window survived:\n$tPlan")
    assert(!tPlan.contains("Exchange SinglePartition"),
      s"admission funnels through one partition:\n$tPlan")
  }

  test("bucketed tables join without a shuffle exchange") {
    val orders = Tables.t(spark, sf, "orders")
    val lineitem = Tables.t(spark, sf, "lineitem")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    try {
      val j = spark.table("lineitem_b").join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
      val plan = j.queryExecution.executedPlan.toString
      // co-located: the join itself needs no Exchange (only the final
      // 3-group aggregation exchanges)
      val joinPart = plan.substring(plan.indexOf("Join"))
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"),
        s"lineitem side shuffled:\n$plan")
      assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        s"orders side shuffled:\n$plan")
      // and it still answers correctly
      val viaBuckets = j.as[(String, Long)].collect().toMap
      val direct = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
        .as[(String, Long)].collect().toMap
      assert(viaBuckets == direct)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("bloomPrunedJoin: exact vs plain join, probe below the exchange") {
    // spark.range sources: a Seq fixture becomes a LocalRelation whose
    // filter constant-folds away at plan time, hiding the probe
    val fact = spark.range(1, 5001).select((col("id") % 600).as("fk"),
      concat(lit("p"), col("id")).as("payload"))
    val dim = spark.range(0, 100).select(col("id").as("dk"),
      concat(lit("d"), col("id")).as("attr")) // selective
    val pruned = SkewJoin.bloomPrunedJoin(fact, dim, "fk", "dk")
      .select("fk", "payload", "attr")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "attr")
    assert(pruned.as[(Long, String, String)].collect().toSet ==
      plain.as[(Long, String, String)].collect().toSet,
      "bloom pruning changed the join result")
    // the probe must sit on the fact SCAN side, BELOW the join (printed
    // deeper in the tree). collect() can't see through AdaptiveSparkPlan
    // pre-execution, so assert on the printed tree positions.
    val plan = pruned.queryExecution.executedPlan.toString
    val joinAt = plan.indexOf("Join")
    val probeAt = plan.indexOf("Filter (UDF(xxhash64")
    assert(joinAt >= 0 && probeAt > joinAt,
      s"bloom probe not below the join (join@$joinAt probe@$probeAt):\n$plan")
  }

  test("round-6 plan shapes: zero-shuffle scan ops, bounded-candidate heavy hitters") {
    val docs = Tables.t(spark, sf, "documents")
    val emb = Tables.t(spark, sf, "embeddings")
    // randomProject: pure scan-side HOFs — no Exchange anywhere
    val rp = graft.llm.Similarity.randomProject(emb, 64, 16)
    assert(!rp.queryExecution.executedPlan.toString.contains("Exchange"),
      "randomProject plan shuffles")
    // BPE encode: chained folds + ONE per-doc reassembly shuffle; the
    // merge applications themselves add none (2 exchanges total:
    // posexplode→groupBy partial/final)
    val enc = graft.llm.Bpe.encode(docs, "text", "doc_id",
      Seq(("e", "</w>"), ("t", "h")))
    val encExchanges = "Exchange".r
      .findAllIn(enc.queryExecution.executedPlan.toString).length
    assert(encExchanges <= 1,
      s"BPE encode pays $encExchanges exchanges — merge folds must be scan-side")
    // heavyHittersExact phase 2: the candidate set joins via BROADCAST
    // (never a domain-sized shuffle of the fact side against candidates)
    val terms = docs.select(explode(split(lower(col("text")), " ")).as("term"))
    val hh = graft.sketch.MisraGries.heavyHittersExact(terms, "term", 64)
    val hhPlan = hh.queryExecution.executedPlan.toString
    assert(hhPlan.contains("BroadcastHashJoin") ||
      hhPlan.contains("BroadcastExchange"),
      s"candidate semi-join not broadcast:\n${hhPlan.take(1500)}")
    // histogram sketch: bounded partial fold below the shuffle, no Window
    val grid = graft.sketch.Histo.sketch(
      Tables.t(spark, sf, "events"), Seq("event_type"),
      round(col("value") * 100, 0).cast("long"), 0L, 1000L, 64)
    val gPlan = grid.queryExecution.executedPlan.toString
    assert(!gPlan.contains("Window") && gPlan.contains("graft_h_partial"),
      s"histogram plan shape:\n${gPlan.take(1200)}")
  }

  test("round-7 plan shapes: broadcast EXISTS probe, cross-free WITH pipe, flat recursion") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    Seq("customer", "orders", "nation").foreach(n =>
      cat.register(n, Tables.t(spark, sf, n)))
    // EXISTS lowers to ONE semi join with the subquery side BROADCAST —
    // the dimension-probe shape, never a cartesian or a fact shuffle
    val ex = HashQL.execute(cat,
      "select customer.c_custkey from customer where exists " +
        "(select orders.o_orderkey from orders " +
        "where orders.o_custkey = customer.c_custkey " +
        "and orders.o_orderstatus = 'F')").get
    val exPlan = ex.queryExecution.executedPlan.toString
    assert(exPlan.contains("LeftSemi") && exPlan.contains("BroadcastExchange"),
      s"EXISTS probe not a broadcast semi join:\n${exPlan.take(1200)}")
    assert(!exPlan.contains("CartesianProduct"))
    // the Cypher WITH pipe is an equi-join of the group-sized stage
    // output against the segment — never a cartesian
    val g = graft.graph.PropertyGraph.fromTpch(
      Tables.t(spark, sf, "customer"), Tables.t(spark, sf, "nation"),
      Tables.t(spark, sf, "region"), Tables.t(spark, sf, "supplier"))
    val piped = g.query(
      "match (c:Customer)-[:IN]->(n:Nation) with n, count(*) as nc " +
        "where nc > 5 match (n)-[:IN]->(r:Region) return n, nc, r")
    assert(!piped.queryExecution.executedPlan.toString.contains("CartesianProduct"),
      "WITH pipe planned a cartesian")
    // a converged recursive CTE serves from its checkpointed fixpoint —
    // the body's plan is a scan (plus the projection), no join replay
    Seq(("a", "b"), ("b", "c"), ("c", "a")).foreach { case (x, y) =>
      HashQL.execute(cat, s"insert into re (s, d) values ('$x', '$y')") }
    val rec = HashQL.execute(cat,
      "with recursive r as (select re.d from re where re.s = 'a' " +
        "union select re.d from r inner join re on re.s = r.d) " +
        "select r.d from r").get
    val recPlan = rec.queryExecution.executedPlan.toString
    assert(recPlan.contains("ExistingRDD") && !recPlan.contains("Join"),
      s"recursive body should scan the checkpointed fixpoint:\n${recPlan.take(800)}")
  }

  test("INSERT delta is O(delta): literals only, no fact-table scan; UPDATE after-image from the before-frame") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    val dir = java.nio.file.Files.createTempDirectory("scale_dml").toString
    (1 to 100).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "v")
      .write.parquet(s"$dir/facts")
    cat.register("t", spark.read.parquet(s"$dir/facts"))
    // the IVM hook's insert delta must plan over the INSERT's literal
    // rows alone — a single FileScan here means a 1-row INSERT pays a
    // table-sized derivation at 100 TB
    val rowDf = cat.insert("t", Seq("g" -> "g0", "v" -> 7L))
    val delta = HashQL.insertDeltaFrame(cat.table("t"), Seq(rowDf))
    val deltaPlan = delta.queryExecution.executedPlan.toString
    assert(!deltaPlan.contains("FileScan") && !deltaPlan.contains("Scan parquet"),
      s"insert delta scans fact files:\n$deltaPlan")
    assert(delta.columns.toSet == cat.table("t").columns.toSet)
    // and end-to-end: a count/sum view folds the delta and KEEPS routing
    val reg = new HashQL.JoinRegistry
    val name = HashQL.materializeAggView(cat,
      "create agg view as select t.g, count(*), count(t.v), sum(t.v) " +
        "from t group by t.g", s"$dir/view", Some(reg))
    try {
      HashQL.execute(cat, "insert into t (g, v) values ('g1', 1000)", Some(reg))
      HashQL.execute(cat, "update t set t.v = t.v + 1 where t.g = 'g2'", Some(reg))
      val routed = HashQL.execute(cat,
        "select t.g, count(*), count(t.v), sum(t.v) from t group by t.g",
        Some(reg)).get
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains(s"$dir/view"),
        s"foldable view dropped its route after INSERT+UPDATE:\n$plan")
      val got = routed.as[(String, Long, Long, Long)].collect().toSet
      graft.matview.MatView.drop(spark, name)
      val recomputed = HashQL.execute(cat,
        "select t.g, count(*), count(t.v), sum(t.v) from t group by t.g",
        Some(reg)).get.as[(String, Long, Long, Long)].collect().toSet
      assert(got == recomputed, s"folded summary drifted: $got vs $recomputed")
    } finally graft.matview.MatView.drop(spark, name)
  }

  test("subqueries under OR plan flag joins — broadcast equi-joins, never a cartesian") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    Seq("customer", "orders").foreach(n =>
      cat.register(n, Tables.t(spark, sf, n)))
    val orEx = HashQL.execute(cat,
      "select customer.c_custkey from customer " +
        "where customer.c_nationkey = 0 or exists " +
        "(select orders.o_orderkey from orders " +
        "where orders.o_custkey = customer.c_custkey " +
        "and orders.o_totalprice >= 100000.0)").get
    val plan = orEx.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"OR-of-EXISTS planned a cross product:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      s"flag join is not an equi-join:\n${plan.take(1500)}")
    orEx.count()
    // the scalar-compare flag under OR stays a broadcast of ONE row
    val orScalar = HashQL.execute(cat,
      "select customer.c_custkey from customer " +
        "where customer.c_custkey = (select max(orders.o_custkey) from orders) " +
        "or customer.c_nationkey = 0").get
    val sPlan = orScalar.queryExecution.executedPlan.toString
    assert(sPlan.contains("BroadcastExchange"),
      s"scalar flag not broadcast:\n${sPlan.take(1200)}")
    orScalar.count()
  }

  test("a twice-referenced CTE materializes once: the body reads the checkpoint, not the files") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    cat.register("orders", Tables.t(spark, sf, "orders"))
    // referenced twice (two UNION ALL branches): the CTE's aggregation
    // must run ONCE — both branches scan the checkpointed result, so the
    // executed body has no parquet scan at all
    val twice = HashQL.execute(cat,
      "with c as (select orders.o_orderpriority, count(*) from orders " +
        "group by orders.o_orderpriority) " +
        "select c.o_orderpriority, c.cnt from c where c.cnt > 0 " +
        "union all select c.o_orderpriority, c.cnt from c where c.cnt < 0").get
    val twicePlan = twice.queryExecution.executedPlan.toString
    assert(!twicePlan.contains("FileScan") && twicePlan.contains("ExistingRDD"),
      s"shared CTE was re-planned per reference:\n${twicePlan.take(1200)}")
    // answers unchanged vs the direct spelling
    val direct = HashQL.execute(cat,
      "select orders.o_orderpriority, count(*) from orders " +
        "group by orders.o_orderpriority").get
      .as[(String, Long)].collect().toSet
    assert(twice.as[(String, Long)].collect().toSet == direct)
    // referenced once: stays a lazy inline plan — the parquet scan (and
    // its pushdown) must survive, no eager materialization
    val once = HashQL.execute(cat,
      "with c as (select orders.o_orderkey, orders.o_custkey from orders " +
        "where orders.o_custkey < 100) select c.o_orderkey from c").get
    val oncePlan = once.queryExecution.executedPlan.toString
    assert(oncePlan.contains("FileScan") && !oncePlan.contains("ExistingRDD"),
      s"single-use CTE was eagerly materialized:\n${oncePlan.take(1200)}")
  }

  test("agg-expression ratios aggregate in ONE pass: single exchange, partials scan-side") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    cat.register("lineitem", Tables.t(spark, sf, "lineitem"))
    // sum/count for the ratio ride the SAME groupBy.agg as the projected
    // count: one logical Aggregate → one shuffle, with map-side partials.
    // A naive lowering (one aggregation per inner aggregate + join) would
    // shuffle the fact table once per EAgg — the 100 TB killer.
    val df = HashQL.execute(cat,
      "select lineitem.l_orderkey, sum(lineitem.l_quantity) / count(*) " +
        "as mean_qty, count(*) as cnt from lineitem " +
        "group by lineitem.l_orderkey").get
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
    assert(aggs.size == 1, s"expected one Aggregate, got ${aggs.size}")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial"),
      s"no map-side partial aggregation in ratio plan:\n${plan.take(1200)}")
    // reserved names stay internal to the plan — never output columns
    assert(!df.columns.exists(_.startsWith("__ag")))
    df.count()
  }

  test("typed date predicates push to the parquet scan; interval folds at plan time") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    cat.register("lineitem", Tables.t(spark, sf, "lineitem"))
    // `<= date '…' - interval '90' day` must reach the scan as a TYPED
    // timestamp filter (constant-folded bound) — at 100 TB this is
    // row-group pruning at I/O rate; a string comparison or an unfolded
    // expression would read everything
    val df = HashQL.execute(cat,
      "select lineitem.l_orderkey from lineitem " +
        "where lineitem.l_shipdate <= date '2001-12-01' - interval '90' day").get
    val scan = df.queryExecution.executedPlan.toString
    val pushed = scan.linesIterator.find(_.contains("PushedFilters"))
    assert(pushed.exists(_.contains("l_shipdate")),
      s"date predicate not pushed to the scan:\n${scan.take(1500)}")
    df.count()
  }

  test("correlated scalar subqueries decorrelate: one aggregate + one equi-join") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    Seq("orders", "lineitem").foreach(n =>
      cat.register(n, Tables.t(spark, sf, n)))
    val df = HashQL.execute(cat,
      "select orders.o_orderkey from orders " +
        "where orders.o_totalprice > ( select max(lineitem.l_extendedprice) " +
        "from lineitem where lineitem.l_orderkey = orders.o_orderkey )").get
    // the standard decorrelation: ONE groupBy over the subquery side,
    // ONE equi-join — never a per-outer-row execution or a nested loop
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
    assert(aggs.size == 1, s"expected one Aggregate, got ${aggs.size}")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"correlated scalar planned a cross product:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      s"decorrelated join is not an equi-join:\n${plan.take(1500)}")
    df.count()
  }

  test("Q5 six-way composite-ON join: dims broadcast, fact streams, no cartesian") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(n => cat.register(n, Tables.t(spark, sf, n)))
    val df = HashQL.execute(cat,
      "select nation.n_name, count(*) from customer " +
        "inner join orders on customer.c_custkey = orders.o_custkey " +
        "inner join lineitem on orders.o_orderkey = lineitem.l_orderkey " +
        "inner join supplier on lineitem.l_suppkey = supplier.s_suppkey " +
        "and customer.c_nationkey = supplier.s_nationkey " +
        "inner join nation on supplier.s_nationkey = nation.n_nationkey " +
        "inner join region on nation.n_regionkey = region.r_regionkey " +
        "where region.r_name = 'MIDDLE EAST' " +
        "and orders.o_orderdate >= date '1996-01-01' " +
        "group by nation.n_name").get
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"Q5 planned a cross product:\n${plan.take(1500)}")
    // at this SF every dim broadcasts; the composite ON stays one
    // equi-join (never splits into join + post-filter cartesian)
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n${plan.take(1200)}")
    // the typed date bound reached a scan
    assert(plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("o_orderdate")),
      "date bound not pushed")
    df.count()
  }

  test("Q7 six-way join with two ALIASES of nation: dims broadcast, no cartesian (round-12)") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    Seq("customer", "orders", "lineitem", "supplier", "nation")
      .foreach(n => cat.register(n, Tables.t(spark, sf, n)))
    val df = HashQL.execute(cat,
      "select n1.n_name as supp_nation, n2.n_name as cust_nation, count(*) " +
        "from supplier " +
        "inner join lineitem on supplier.s_suppkey = lineitem.l_suppkey " +
        "inner join orders on lineitem.l_orderkey = orders.o_orderkey " +
        "inner join customer on orders.o_custkey = customer.c_custkey " +
        "inner join nation n1 on supplier.s_nationkey = n1.n_nationkey " +
        "inner join nation n2 on customer.c_nationkey = n2.n_nationkey " +
        "where n1.n_name = 'NATION_1' and n2.n_name = 'NATION_2' " +
        "group by supp_nation, cust_nation").get
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"Q7 planned a cross product:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n${plan.take(1200)}")
    // the per-alias name filters push into each nation scan — the two
    // renamed frames stay independent parquet reads with their own
    // pruning, not one shared ambiguous scan
    assert(plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("n_name")),
      "alias dim filter not pushed")
    df.count()
  }

  test("Q21 shape: EXISTS/NOT-EXISTS self-join correlation stays hash semi/anti (round-12)") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    Seq("supplier", "lineitem", "orders", "nation")
      .foreach(n => cat.register(n, Tables.t(spark, sf, n)))
    val df = HashQL.execute(cat,
      "select supplier.s_name, count(*) as numwait from supplier " +
        "inner join lineitem l1 on supplier.s_suppkey = l1.l_suppkey " +
        "inner join orders on l1.l_orderkey = orders.o_orderkey " +
        "inner join nation on supplier.s_nationkey = nation.n_nationkey " +
        "where orders.o_orderstatus = 'F' " +
        "and exists ( select l2.l_orderkey from lineitem l2 " +
        "where l2.l_orderkey = l1.l_orderkey and l2.l_suppkey <> l1.l_suppkey ) " +
        "and not exists ( select l3.l_orderkey from lineitem l3 " +
        "where l3.l_orderkey = l1.l_orderkey and l3.l_suppkey <> l1.l_suppkey " +
        "and l3.l_shipdate > date '2000-06-30' ) " +
        "group by supplier.s_name").get
    val plan = df.queryExecution.executedPlan.toString
    // the cross inequalities ride the semi/anti JOIN CONDITIONS — hash
    // joins on the equality key, never a nested loop over lineitem²
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"Q21 subqueries degenerated:\n${plan.take(1500)}")
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"),
      s"expected semi+anti joins:\n${plan.take(1500)}")
    df.count()
  }

  test("QUALIFY plans Filter-over-Window — no extra exchange beyond the window's") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    cat.register("orders", Tables.t(spark, sf, "orders"))
    val df = HashQL.execute(cat,
      "select orders.o_custkey, orders.o_orderkey, " +
        "row_number() over (partition by orders.o_custkey " +
        "order by orders.o_totalprice desc, orders.o_orderkey) as rn " +
        "from orders where orders.o_orderkey <= 100000 qualify rn <= 2").get
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"no window node:\n${plan.take(800)}")
    // exactly ONE exchange: the window's partitionBy shuffle — QUALIFY
    // is a post-window filter, not another shuffle
    val exchanges = plan.linesIterator.count(_.trim.startsWith("+- Exchange")) +
      plan.linesIterator.count(_.trim.startsWith(":- Exchange")) +
      plan.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 1, s"QUALIFY added exchanges:\n${plan.take(1500)}")
    df.count()
  }

  test("grouped windows plan Window over Aggregate — one added exchange at most (round-13)") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    cat.register("orders", Tables.t(spark, sf, "orders"))
    val df = HashQL.execute(cat,
      "select orders.o_custkey, sum(orders.o_totalprice) as s, " +
        "rank() over (order by s desc) as r from orders " +
        "group by orders.o_custkey qualify r <= 5").get
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"no window node:\n${plan.take(800)}")
    assert(plan.contains("HashAggregate") || plan.contains("Aggregate"),
      s"no aggregate under the window:\n${plan.take(800)}")
    // the aggregation's key shuffle + the window's own exchange, nothing
    // more — QUALIFY stays a post-window filter, and the window computes
    // over the GROUP frame (one row per custkey), never the fact rows
    val exchanges = plan.linesIterator.count(_.trim
      .replaceFirst("^[:+]- ", "").startsWith("Exchange"))
    assert(exchanges <= 2, s"grouped window added exchanges:\n${plan.take(1500)}")
    // the window sits ABOVE the aggregate in the tree
    assert(plan.indexOf("Window") < plan.indexOf("HashAggregate"),
      s"window not over aggregate:\n${plan.take(1500)}")
    df.count()
  }

  test("comma joins plan hash joins with pushdown — never cartesian (round-13)") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    Seq("customer", "orders", "lineitem")
      .foreach(n => cat.register(n, Tables.t(spark, sf, n)))
    val df = HashQL.execute(cat,
      "select customer.c_custkey, count(*) from customer, orders, lineitem " +
        "where customer.c_custkey = orders.o_custkey " +
        "and orders.o_orderkey = lineitem.l_orderkey " +
        "and customer.c_mktsegment = 'BUILDING' " +
        "group by customer.c_custkey").get
    val plan = df.queryExecution.executedPlan.toString
    // the optimizer folded the WHERE equalities into join conditions —
    // hash/merge joins, the segment filter pushed into the customer scan
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"comma join stayed cartesian:\n${plan.take(1500)}")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"no equi-join:\n${plan.take(1200)}")
    assert(plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("c_mktsegment")),
      "segment filter not pushed")
    df.count()
  }

  test("aliased self-join is one equi-join; filters push into both scans (round-12)") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    cat.register("lineitem", Tables.t(spark, sf, "lineitem"))
    val df = HashQL.execute(cat,
      "select l1.l_orderkey, l1.l_linenumber, l2.l_linenumber as ln2 " +
        "from lineitem l1 inner join lineitem l2 on l1.l_orderkey = l2.l_orderkey " +
        "where l1.l_linenumber < l2.l_linenumber and l1.l_orderkey <= 500").get
    val plan = df.queryExecution.executedPlan.toString
    // one EQUI-join on the key (hash or merge), the inequality riding as
    // a post-join condition — NEVER a cartesian/nested-loop pair scan
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), s"self-join degenerated:\n${plan.take(1500)}")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"no equi-join:\n${plan.take(1200)}")
    // the orderkey bound pushes into the parquet scans — at 100 TB the
    // self-join reads the pruned range twice, not the table twice
    assert(plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("l_orderkey")),
      "orderkey bound not pushed")
    df.count()
  }

  test("a cheap multiply-referenced CTE stays lazy — pushdown survives (r10 advice)") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    cat.register("orders", Tables.t(spark, sf, "orders"))
    // scan-filter-project CTE referenced twice: double-planning a scan
    // beats materializing it, and the body's extra filters must still
    // push into the parquet read (localCheckpoint would sever that and
    // pin the plan to current executors)
    val df = HashQL.execute(cat,
      "with c as (select orders.o_orderkey, orders.o_custkey from orders " +
        "where orders.o_custkey < 500) " +
        "select c.o_orderkey from c where c.o_orderkey < 100 " +
        "union all select c.o_orderkey from c where c.o_orderkey > 100000000").get
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan") && !plan.contains("ExistingRDD"),
      s"cheap CTE was eagerly materialized:\n${plan.take(1200)}")
    // each branch's own predicate reached a scan
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.exists(_.contains("o_orderkey")),
      s"body predicate did not push into the CTE scan:\n${pushed.mkString("\n")}")
    df.count()
  }

  test("quantified ALL compares against ONE broadcast stats row — no row-to-row join (round-13)") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    Seq("supplier", "customer").foreach(n =>
      cat.register(n, Tables.t(spark, sf, n)))
    val df = HashQL.execute(cat,
      "select supplier.s_suppkey from supplier " +
        "where supplier.s_acctbal > all ( select customer.c_acctbal " +
        "from customer where customer.c_nationkey = 3 )").get
    // the only join is against the ≤1-row stats aggregate — a fat
    // (both-sides-many-rows) join would be the per-row anti-pattern
    val fat = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if !j.left.maxRows.exists(_ <= 1) &&
            !j.right.maxRows.exists(_ <= 1) => j
    }
    assert(fat.isEmpty,
      s"quantifier planned a row-to-row join:\n${df.queryExecution.optimizedPlan.toString.take(1500)}")
    val plan = df.queryExecution.executedPlan.toString
    // the subquery side collapsed to one aggregation (partial+final)
    assert(plan.contains("Aggregate"), plan.take(1000))
    // …and its nationkey filter still pushed to the parquet scan
    assert(plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("c_nationkey")),
      "subquery filter not pushed")
    df.count()
  }

  test("LATERAL aggregates decorrelate: one grouped aggregate + one equi-join (round-13)") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    Seq("customer", "orders").foreach(n =>
      cat.register(n, Tables.t(spark, sf, n)))
    val df = HashQL.execute(cat,
      "select customer.c_custkey, t.cnt from customer, " +
        "lateral ( select count(*) from orders " +
        "where orders.o_custkey = customer.c_custkey ) t " +
        "where customer.c_custkey <= 100").get
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"lateral planned per-row:\n${plan.take(1500)}")
    // the body's aggregation ran grouped (keys), once
    assert(plan.contains("Aggregate"), plan.take(1000))
    // the outer-only WHERE pushed below the lateral join into the scan
    assert(plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("c_custkey")),
      "outer filter not pushed below the lateral join")
    df.count()
  }

  test("row-returning LATERAL plans one keyed window + one equi-join — never per-row (round-14)") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    Seq("customer", "orders").foreach(n =>
      cat.register(n, Tables.t(spark, sf, n)))
    val df = HashQL.execute(cat,
      "select customer.c_custkey, x.ok from customer, " +
        "lateral ( select orders.o_orderkey as ok from orders " +
        "where orders.o_custkey = customer.c_custkey " +
        "order by orders.o_totalprice desc, orders.o_orderkey limit 1 ) x " +
        "where customer.c_custkey <= 100").get
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"lateral planned per-row:\n${plan.take(1500)}")
    // the top-1 pick is a keyed window over the INNER side only…
    assert(plan.contains("Window"), plan.take(1000))
    // …with the rank limit pushed into the per-group sort, and no
    // global single-partition stage anywhere
    assert(plan.contains("WindowGroupLimit"),
      s"row_number≤k did not push into the sort:\n${plan.take(1500)}")
    assert(!plan.contains("SinglePartition"),
      s"lateral top-1 planned a global stage:\n${plan.take(1500)}")
    df.count()
  }

  test("MERGE / UPDATE FROM / PIVOT plan shapes: hash joins, one aggregation (round-14)") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    cat.register("customer", Tables.t(spark, sf, "customer"))
    cat.register("orders", Tables.t(spark, sf, "orders"))
    // PIVOT with EXPLICIT values: one aggregation pair (partial+final),
    // no distinct-values pre-job, never a cartesian
    val p = HashQL.execute(cat,
      "pivot orders on orders.o_orderstatus in ('O', 'F', 'P') " +
        "using count(*) group by orders.o_custkey").get
    val pp = p.queryExecution.executedPlan.toString
    assert(!pp.contains("CartesianProduct") &&
      !pp.contains("BroadcastNestedLoopJoin"), pp.take(1200))
    // Spark's pivot-with-values plan: per-(group, value) cell aggregate
    // then a PivotFirst aggregate — TWO partial+final pairs, both
    // key-partitioned (4 physical nodes); anything more would mean a
    // distinct-values job leaked in
    val nAgg = "HashAggregate|SortAggregate|ObjectHashAggregate".r
      .findAllIn(pp).length
    assert(nAgg <= 4, s"pivot planned $nAgg aggregate nodes:\n${pp.take(1200)}")
    p.count()
    // MERGE: the committed plan is one left join + one anti join over
    // the reserve-renamed source — hash joins only
    HashQL.execute(cat,
      "insert into d14 (ck, nb) values (1, 111), (999999999, 5)")
    HashQL.execute(cat,
      "merge into customer using d14 on customer.c_custkey = d14.ck " +
        "when matched then update set customer.c_acctbal = d14.nb " +
        "when not matched then insert (c_custkey, c_acctbal) " +
        "values (d14.ck, d14.nb)")
    val mp = cat.table("customer").queryExecution.executedPlan.toString
    assert(!mp.contains("CartesianProduct") &&
      !mp.contains("BroadcastNestedLoopJoin"),
      s"MERGE planned per-row:\n${mp.take(1500)}")
    cat.table("customer").count()
    // UPDATE … FROM: one hit-guarded join projection — hash joins only
    HashQL.execute(cat,
      "update customer set customer.c_acctbal = d14.nb from d14 " +
        "where customer.c_custkey = d14.ck")
    val up = cat.table("customer").queryExecution.executedPlan.toString
    assert(!up.contains("CartesianProduct") &&
      !up.contains("BroadcastNestedLoopJoin"),
      s"UPDATE FROM planned per-row:\n${up.take(1500)}")
    cat.table("customer").count()
  }

  test("lateralTopK prunes the ranked inner side under a FILTERED outer (round-15)") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    Seq("customer", "orders").foreach(n =>
      cat.register(n, Tables.t(spark, sf, n)))
    // FILTERED outer: the outer-only WHERE now applies BEFORE the
    // lateral, and a left-semi join prunes the inner body on the
    // correlation keys BEFORE the ranking window
    val df = HashQL.execute(cat,
      "select customer.c_custkey, x.ok from customer, " +
        "lateral ( select orders.o_orderkey as ok from orders " +
        "where orders.o_custkey = customer.c_custkey " +
        "order by orders.o_totalprice desc, orders.o_orderkey limit 1 ) x " +
        "where customer.c_custkey <= 100").get
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"no inner-side semi prune under a filtered outer:\n${plan.take(1500)}")
    // the semi join sits BELOW the window (prunes before ranking)
    val semiIdx = plan.indexOf("LeftSemi")
    val winIdx = plan.indexOf("WindowGroupLimit")
    assert(winIdx >= 0 && semiIdx > winIdx,
      s"semi prune did not precede the ranking window:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
    df.count()
    // UNFILTERED outer: no prune — the full-table lateral is optimal
    val df2 = HashQL.execute(cat,
      "select customer.c_custkey, x.ok from customer, " +
        "lateral ( select orders.o_orderkey as ok from orders " +
        "where orders.o_custkey = customer.c_custkey " +
        "order by orders.o_totalprice desc, orders.o_orderkey limit 1 ) x").get
    val plan2 = df2.queryExecution.executedPlan.toString
    assert(!plan2.contains("LeftSemi"),
      s"unfiltered outer planned a useless semi probe:\n${plan2.take(1500)}")
  }

  test("UNNEST and generate_series plan as per-row Generate — zero shuffles (round-15)") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    cat.register("documents", Tables.t(spark, sf, "documents"))
    val df = HashQL.execute(cat,
      "select documents.doc_id, u.w from documents, " +
        "unnest(split(documents.text, ' ')) as u(w) " +
        "where documents.doc_id <= 50").get
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"),
      s"UNNEST did not plan a Generate:\n${plan.take(1200)}")
    assert(!plan.contains("Exchange"),
      s"UNNEST planned a shuffle:\n${plan.take(1500)}")
    // the doc_id filter still reaches the parquet scan below the Generate
    assert(plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("doc_id")),
      "filter not pushed below UNNEST")
    df.count()
    val gs = HashQL.execute(cat,
      "select g.i from generate_series(1, 100) g(i)").get
    val gp = gs.queryExecution.executedPlan.toString
    assert(gp.contains("Generate") && !gp.contains("Exchange"),
      s"generate_series planned a shuffle:\n${gp.take(1200)}")
    assert(gs.count() == 100L)
  }

  test("dynamic PIVOT: one bounded distinct probe; cap rejects high cardinality (round-15)") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    cat.register("orders", Tables.t(spark, sf, "orders"))
    // o_orderstatus has 3 values — the probe is one limit-capped
    // distinct job, then the SAME explicit-values plan (≤4 agg nodes)
    val p = HashQL.execute(cat,
      "pivot orders on orders.o_orderstatus using count(*) " +
        "group by orders.o_custkey").get
    val pp = p.queryExecution.executedPlan.toString
    val nAgg = "HashAggregate|SortAggregate|ObjectHashAggregate".r
      .findAllIn(pp).length
    assert(nAgg <= 4, s"dynamic pivot leaked extra aggregates:\n${pp.take(1200)}")
    p.count()
    // a high-cardinality pivot key rejects toward the explicit list
    val cap = intercept[IllegalArgumentException](HashQL.execute(cat,
      "pivot orders on orders.o_orderkey using count(*) " +
        "group by orders.o_orderstatus"))
    assert(cap.getMessage.contains("explicit IN list"), cap.getMessage)
    // multi-aggregate USING (round-16): ALL aggregates ride the same
    // single aggregation pass — no per-aggregate re-aggregation
    val m = HashQL.execute(cat,
      "pivot orders on orders.o_orderstatus " +
        "using sum(orders.o_totalprice) as s, count(*) as c " +
        "group by orders.o_custkey").get
    val mp = m.queryExecution.executedPlan.toString
    val mAgg = "HashAggregate|SortAggregate|ObjectHashAggregate".r
      .findAllIn(mp).length
    assert(mAgg <= 4, s"multi-agg pivot leaked aggregations:\n${mp.take(1200)}")
    m.count()
  }

  test("two-range EXISTS: banded bucket equi-join, no nested loop (round-16)") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    cat.register("orders", Tables.t(spark, sf, "orders"))
    cat.register("lineitem", Tables.t(spark, sf, "lineitem"))
    // a JOINT two-range witness with NO equality key — naively a
    // BroadcastNestedLoopJoin (O(|orders|·|lineitem|)); the banded plan
    // is a hash semi join on the 1024-bucket key
    val df = HashQL.execute(cat,
      "select orders.o_orderkey from orders " +
        "where exists ( select lineitem.l_orderkey from lineitem " +
        "where lineitem.l_orderkey < orders.o_orderkey " +
        "and lineitem.l_suppkey > orders.o_custkey )").get
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"two-range EXISTS planned a nested loop:\n${plan.take(1500)}")
    assert(plan.contains("LeftSemi"), plan.take(800))
    df.count()
  }

  test("bivariate/moment tiers ride ONE aggregation pass (round-15)") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    cat.register("lineitem", Tables.t(spark, sf, "lineitem"))
    val df = HashQL.execute(cat,
      "select lineitem.l_returnflag, " +
        "corr(lineitem.l_quantity, lineitem.l_linenumber) as r, " +
        "regr_slope(lineitem.l_quantity, lineitem.l_linenumber) as sl, " +
        "skewness(lineitem.l_quantity) as sk, " +
        "kurtosis(lineitem.l_quantity) as ku " +
        "from lineitem group by lineitem.l_returnflag").get
    val plan = df.queryExecution.executedPlan.toString
    // every desugared moment shares the SAME groupBy.agg pass: one
    // shuffle (partial+final pair), never an aggregation per aggregate
    val nEx = "Exchange".r.findAllIn(plan).length
    assert(nEx == 1, s"stats tier shuffled $nEx times:\n${plan.take(1500)}")
    val nAgg = "HashAggregate|SortAggregate|ObjectHashAggregate".r
      .findAllIn(plan).length
    assert(nAgg <= 2, s"stats tier leaked extra aggregations:\n${plan.take(1500)}")
    df.count()
  }

  test("LIMIT WITH TIES: bounded probe + literal filter — no rank window (round-15)") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    cat.register("orders", Tables.t(spark, sf, "orders"))
    val df = HashQL.execute(cat,
      "select orders.o_orderkey, orders.o_orderpriority from orders " +
        "order by orders.o_orderpriority limit 10 with ties").get
    val plan = df.queryExecution.executedPlan.toString
    // ties resolve through a driver-collected threshold + a literal
    // lexicographic filter: the result plan must carry NO window and
    // no single-partition stage — a global rank() would put every row
    // through one task at any scale
    assert(!plan.contains("Window"),
      s"WITH TIES planned a window:\n${plan.take(1200)}")
    assert(!plan.contains("SinglePartition"),
      s"WITH TIES planned a single-partition step:\n${plan.take(1500)}")
    assert(df.count() >= 10L)
  }

  test("list lambdas run scan-side — no Generate, no Exchange (round-15)") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    cat.register("customer", Tables.t(spark, sf, "customer"))
    val df = HashQL.execute(cat,
      "select customer.c_custkey, " +
        "list_sum(list_transform(split(customer.c_name, '#'), " +
        "x -> length(x))) as lsum " +
        "from customer where customer.c_custkey <= 100").get
    val plan = df.queryExecution.executedPlan.toString
    // per-element work stays INSIDE the row (HOF codegen) — exploding
    // would multiply the scan by average list length
    assert(!plan.contains("Generate"),
      s"lambda exploded rows:\n${plan.take(1200)}")
    assert(!plan.contains("Exchange"),
      s"lambda planned a shuffle:\n${plan.take(1500)}")
    assert(plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("c_custkey")),
      "filter not pushed below the lambda projection")
    df.count()
  }

  test("DISTINCT ON plans a keyed window — partition exchange, never a global sort (round-13)") {
    import graft.core.GraftCatalog
    import graft.sql.HashQL
    val cat = new GraftCatalog(spark)
    cat.register("orders", Tables.t(spark, sf, "orders"))
    val df = HashQL.execute(cat,
      "select distinct on (orders.o_custkey) orders.o_custkey, " +
        "orders.o_orderkey, orders.o_totalprice from orders " +
        "order by orders.o_custkey, orders.o_totalprice desc, " +
        "orders.o_orderkey").get
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(1000))
    // partitioned by the ON key — no single-partition exchange anywhere
    assert(!plan.contains("SinglePartition"),
      s"DISTINCT ON planned a global single-partition step:\n${plan.take(1500)}")
    df.count()
  }
}
