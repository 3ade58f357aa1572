package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.{TextFunctions => TF}

/** Ad-hoc stage timing for optimization rounds: times labeled
  * sub-plans of hot queries with the noop sink (guide §1.4/§1.5) so a
  * query's cost splits into its operator stages. Measurement tool
  * only — never part of the driver contract.
  * Usage: Hotspot <sfDir> <case> [reps]
  */
object Hotspot {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1) else "q54"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach { t =>
      try {
        if (t == "events") Tables.events(spark, sfDir).count()
        else Tables.load(spark, sfDir, t).count()
      } catch { case _: Throwable => () }
    }
    def time(label: String)(df: => DataFrame): Unit = {
      var best = Double.MaxValue
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"HOTSPOT $label%-28s $best%8.3f s")
    }

    which match {
      case "q54" =>
        val docs = Tables.documents(spark, sfDir)
        val k = 3; val threshold = 0.5
        // mirror of the CURRENT ngramJaccardPairsPrefix stages (keep in
        // sync with Dedup.scala when restructuring)
        val sh = docs.select(col("doc_id"),
            graft.plans.SortedShingleHashes.sortedShingleHashes(
              TF.tokens(col("text")), k).as("__arr"))
          .select(col("doc_id"), size(col("__arr")).cast("long").as("n"),
            explode(col("__arr")).as("shingle"))
        time("postings(sh)")(sh)
        val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        time("dfreq")(dfreq)
        // the r17 in-row prefix (collect + sort_array + slice), not the
        // removed row_number Window
        val prefix = sh.join(dfreq, "shingle")
          .groupBy(col("doc_id"))
          .agg(max(col("n")).as("n"),
            sort_array(collect_list(struct(col("df"), col("shingle")))).as("ps"))
          .select(col("doc_id"), col("n"),
            explode(slice(col("ps"), lit(1),
              (col("n") - ceil(lit(threshold) * col("n")) + 1).cast("int"))).as("p"))
          .select(col("doc_id"), col("n"), col("p.shingle").as("s"))
        time("prefix")(prefix)
        val cand = prefix.groupBy(col("s"))
          .agg(collect_list(struct(col("doc_id"), col("n"))).as("g"))
          .select(explode(col("g")).as("a"), col("g"))
          .select(col("a"), explode(col("g")).as("b"))
          .filter(col("a.doc_id") < col("b.doc_id") &&
            lit(threshold) * col("b.n") <= col("a.n") &&
            lit(threshold) * col("a.n") <= col("b.n"))
          .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
            col("a.n").as("n1"), col("b.n").as("n2"))
          .distinct()
        time("candidates")(cand)
        val lists = docs
          .filter(size(TF.tokens(col("text"))) >= k)
          .select(col("doc_id"),
            graft.plans.SortedShingleHashes.sortedShingleHashes(
              TF.tokens(col("text")), k).as("sharr"))
        time("lists")(lists)
        println(s"HOTSPOT n_candidates = ${cand.count()}")
        val ver = cand
          .join(lists.toDF("d1", "a1"), "d1")
          .join(lists.toDF("d2", "a2"), "d2")
          .withColumn("inter", size(array_intersect(col("a1"), col("a2"))).cast("long"))
          .withColumn("jaccard", col("inter") / (col("n1") + col("n2") - col("inter")))
          .filter(col("jaccard") > threshold)
          .select(col("d1"), col("d2"), round(col("jaccard"), 4).as("jaccard"))
        time("verify_tail")(ver)
        time("full_q54")(graft.operators.Dedup.ngramJaccardPairsPrefix(
          docs, "doc_id", "text", k, threshold))
      case "q54v" =>
        // verification-tail variants at large SF: SMJ vs shuffled-hash
        // array attach, and the exact PPJoin positional filter
        val docs = Tables.documents(spark, sfDir)
        val k = 3; val threshold = 0.5
        val sh = docs.select(col("doc_id"),
            graft.plans.SortedShingleHashes.sortedShingleHashes(
              TF.tokens(col("text")), k).as("__arr"))
          .select(col("doc_id"), size(col("__arr")).cast("long").as("n"),
            explode(col("__arr")).as("shingle"))
        val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        // prefix WITH positions (1-based rank in the doc's sorted list)
        val prefixPos = sh.join(dfreq, "shingle")
          .groupBy(col("doc_id"))
          .agg(max(col("n")).as("n"),
            sort_array(collect_list(struct(col("df"), col("shingle")))).as("ps"))
          .select(col("doc_id"), col("n"),
            posexplode(slice(col("ps"), lit(1),
              (col("n") - ceil(lit(threshold) * col("n")) + 1).cast("int"))))
          .select(col("doc_id"), col("n"), (col("pos") + 1).cast("long").as("p"),
            col("col.shingle").as("s"))
        def candidatesFrom(pre: org.apache.spark.sql.DataFrame,
                           positional: Boolean) = {
          val g = pre.groupBy(col("s"))
            .agg(collect_list(struct(col("doc_id"), col("n"), col("p"))).as("g"))
            .select(explode(col("g")).as("a"), col("g"))
            .select(col("a"), explode(col("g")).as("b"))
            .filter(col("a.doc_id") < col("b.doc_id") &&
              lit(threshold) * col("b.n") <= col("a.n") &&
              lit(threshold) * col("a.n") <= col("b.n"))
          val pf = if (positional)
            g.filter((lit(1L) + least(col("a.n") - col("a.p"), col("b.n") - col("b.p"))) *
              (lit(1.0) + lit(threshold)) >=
              lit(threshold) * (col("a.n") + col("b.n")) - lit(1e-6))
          else g
          pf.select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
              col("a.n").as("n1"), col("b.n").as("n2"))
            .distinct()
        }
        val lists = docs
          .filter(size(TF.tokens(col("text"))) >= k)
          .select(col("doc_id"),
            graft.plans.SortedShingleHashes.sortedShingleHashes(
              TF.tokens(col("text")), k).as("sharr"))
        def tail(c: org.apache.spark.sql.DataFrame, shj: Boolean) = {
          val l1 = if (shj) lists.toDF("d1", "a1").hint("shuffle_hash") else lists.toDF("d1", "a1")
          val l2 = if (shj) lists.toDF("d2", "a2").hint("shuffle_hash") else lists.toDF("d2", "a2")
          c.join(l1, "d1").join(l2, "d2")
            .withColumn("inter", size(array_intersect(col("a1"), col("a2"))).cast("long"))
            .withColumn("jaccard", col("inter") / (col("n1") + col("n2") - col("inter")))
            .filter(col("jaccard") > threshold)
            .select(col("d1"), col("d2"), round(col("jaccard"), 4).as("jaccard"))
        }
        val cPlain = candidatesFrom(prefixPos, positional = false)
        val cPos = candidatesFrom(prefixPos, positional = true)
        println(s"HOTSPOT n_cand plain = ${cPlain.count()}")
        println(s"HOTSPOT n_cand positional = ${cPos.count()}")
        time("tail_smj_plain")(tail(cPlain, shj = false))
        time("tail_shj_plain")(tail(cPlain, shj = true))
        time("tail_shj_positional")(tail(cPos, shj = true))
        time("full_current")(graft.operators.Dedup.ngramJaccardPairsPrefix(
          docs, "doc_id", "text", k, threshold))
      case "stats" =>
        val docs = Tables.documents(spark, sfDir)
        val lists = docs
          .filter(size(TF.tokens(col("text"))) >= 3)
          .select(col("doc_id"),
            graft.plans.SortedShingleHashes.sortedShingleHashes(
              TF.tokens(col("text")), 3).as("sharr"))
        println(s"HOTSPOT docs sizeInBytes  = ${docs.queryExecution.optimizedPlan.stats.sizeInBytes}")
        println(s"HOTSPOT lists sizeInBytes = ${lists.queryExecution.optimizedPlan.stats.sizeInBytes}")
        println(s"HOTSPOT autoBroadcast     = ${spark.sessionState.conf.autoBroadcastJoinThreshold}")
      case "q75" =>
        val docs = Tables.documents(spark, sfDir)
        val sh = docs.select(col("doc_id"),
            explode(TF.shingles(TF.tokens(coalesce(col("text"), lit(""))), 16)).as("s"))
          .select(col("doc_id"), xxhash64(col("s")).as("h"))
        time("shingle+hash")(sh)
        val occ = sh.groupBy(col("h")).agg(count(lit(1)).as("occ"))
        time("occ-agg")(occ)
        time("full_q75")(graft.operators.Dedup.duplicateSpanStats(
          docs, "doc_id", "text", win = 16))
      case "q115" =>
        val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey"))
        val e = li.groupBy(col("l_orderkey"))
          .agg(collect_set(col("l_partkey")).as("ps"))
          .select(explode(col("ps")).as("src"), col("ps"))
          .select(col("src"), explode(col("ps")).as("dst"))
          .filter(col("src") =!= col("dst"))
          .distinct()
        time("edges")(e)
        time("pr_iter1")(
          graft.operators.Graph.pageRankInt(e, "src", "dst", iterations = 1))
        time("pr_iter3")(
          graft.operators.Graph.pageRankInt(e, "src", "dst", iterations = 3))
        time("full_q115")(
          graft.operators.Graph.pageRankInt(e, "src", "dst", iterations = 3)
            .select(col("vertex").as("part"), col("rank").as("pr"))
            .orderBy(col("part")))
      case "q115b" =>
        import org.apache.spark.storage.StorageLevel
        val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey"))
        val e0 = li.groupBy(col("l_orderkey"))
          .agg(collect_set(col("l_partkey")).as("ps"))
          .select(explode(col("ps")).as("src"), col("ps"))
          .select(col("src"), explode(col("ps")).as("dst"))
          .filter(col("src") =!= col("dst"))
          .distinct()
        val e = e0.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
        e.count()
        val vertices = e.select(col("src").as("vertex"))
          .union(e.select(col("dst").as("vertex"))).distinct()
        val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        val scale = 1000000L; val dampNum = 85L; val dampDen = 100L
        val fl = (scale * (dampDen - dampNum)) / dampDen
        var ranks = vertices
          .join(outDeg, vertices("vertex") === outDeg("src"), "left")
          .select(col("vertex"), coalesce(col("deg"), lit(0L)).as("deg"),
            lit(scale).as("rank"))
        for (_ <- 1 to 3) {
          val shares = ranks.filter(col("deg") > 0)
            .select(col("vertex").as("share_src"), expr("rank div deg").as("share"))
          val incoming = e.join(shares, col("src") === col("share_src"))
            .groupBy(col("dst")).agg(sum(col("share")).as("s"))
            .select(col("dst").as("in_dst"), col("s"))
          ranks = ranks
            .join(incoming, col("vertex") === col("in_dst"), "left")
            .select(col("vertex"), col("deg"),
              (lit(fl) +
                expr(s"($dampNum * coalesce(s, CAST(0 AS BIGINT))) div $dampDen"))
                .as("rank"))
        }
        time("lazy_pr3")(ranks.select(col("vertex").as("part"), col("rank").as("pr"))
          .orderBy(col("part")))
        e.unpersist(false)
      case "q110" =>
        val docs = Tables.documents(spark, sfDir)
        val toks = docs.select(col("doc_id"),
          TF.tokens(coalesce(col("text"), lit(""))).as("w"))
        val sh = toks.select(col("doc_id"),
            posexplode(graft.plans.ShingleHashes.shingleHashes(col("w"), 16))
              .as(Seq("i", "h")))
        time("pos-hashes")(sh)
        val dup = sh.groupBy(col("h"))
          .agg(count(lit(1)).as("occ"),
            min(struct(col("doc_id"), col("i"))).as("first"))
          .filter(col("occ") >= 2)
        time("dup-elect")(dup)
        val marks = sh.join(dup, "h")
          .filter(!(col("doc_id") === col("first.doc_id") &&
            col("i") === col("first.i")))
          .groupBy(col("doc_id")).agg(collect_list(col("i")).as("ms"))
        time("marks")(marks)
        time("full_q110")(graft.operators.Dedup.removeDuplicateSpans(
          docs, "doc_id", "text", win = 16))
      case "q117" =>
        val orders = Tables.orders(spark, sfDir)
        time("profile_exact")(graft.operators.Profile.profile(orders))
        time("profile_sketch")(graft.operators.Profile.profile(orders, exact = false))
      case "q73" =>
        time("full_q73")(graft.operators.SemDedup.semDedupAdaptive(
          Tables.embeddings(spark, sfDir), threshold = 0.4))
      case "q59cc" =>
        val docs = Tables.documents(spark, sfDir)
        val pairs = graft.operators.Dedup.ngramJaccardPairsPrefix(
          docs, "doc_id", "text", k = 3, threshold = 0.5)
        time("pairs_only")(pairs)
        val t0 = System.nanoTime()
        val cc = graft.operators.Cluster.connectedComponents(pairs, "d1", "d2")
        cc.write.format("noop").mode("overwrite").save()
        println(f"HOTSPOT cc_after_pairs            ${(System.nanoTime() - t0) / 1e9}%8.3f s (single run)")
      case "q140" =>
        // per-REP timing (not min): the q140 diagnosis needs to see
        // whether the warm snapshot read is bimodal, and which rep
        // pays — plus a stage split of build vs read vs orderBy
        val t0 = System.nanoTime()
        val q = graft.SparkEntry.queries("q140_replace_where")
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"HOTSPOT rep1(build+read)          ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        (2 to reps).foreach { i =>
          val t = System.nanoTime()
          q(spark, sfDir).write.format("noop").mode("overwrite").save()
          println(f"HOTSPOT rep$i(read)                ${(System.nanoTime() - t) / 1e9}%8.3f s")
        }
      case other => sys.error(s"unknown case $other")
    }
    spark.stop()
  }
}
