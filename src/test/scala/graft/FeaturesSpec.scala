package graft

import org.apache.spark.sql.functions._

import graft.ops.Features
import graft.sources.Tables

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("standardize: z-scores recenter to ~0/sd ~1, min-max lands in [0,1]") {
    val out = Features.standardize(spark, sf).cache()
    val n = out.count()
    assert(n > 0)
    val row = out.agg(
      avg($"z_qty"), stddev_samp($"z_qty"),
      min($"mm_disc"), max($"mm_disc")).head
    assert(math.abs(row.getDouble(0)) < 1e-3)          // mean ~ 0
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-3)    // sd ~ 1
    assert(row.getDouble(2) >= 0.0 && row.getDouble(3) <= 1.0)
    // the rounded min-max endpoints are attained exactly
    assert(row.getDouble(2) === 0.0 && row.getDouble(3) === 1.0)
    out.unpersist()
  }

  test("quantile bins: 4 bins, ~equal frequency, contiguous non-overlapping ranges") {
    val bins = Features.quantileBins(spark, sf)
      .orderBy($"bin").collect()
    assert(bins.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    val counts = bins.map(_.getLong(1))
    val total = counts.sum
    // equal-frequency up to the integer-valued ties at the boundaries
    counts.foreach(c => assert(math.abs(c - total / 4.0) < total * 0.15))
    // ranges are ordered and non-overlapping
    val ranges = bins.map(r => (r.getDouble(2), r.getDouble(3)))
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) => assert(hi < lo)
      case _ => }
  }

  test("target encoding: shrinks every segment mean toward the global mean") {
    val joined = graft.sources.Tables.orders(spark, sf)
      .join(graft.sources.Tables.customer(spark, sf),
        $"o_custkey" === $"c_custkey")
    val gm = joined.agg(avg($"o_totalprice")).head.getDouble(0)
    val enc = Features.targetEncode(spark, sf).collect()
    assert(enc.length >= 3) // the mkt segments present
    enc.foreach { r =>
      val (segMean, smooth) = (r.getDouble(2), r.getDouble(3))
      // smoothed value lies strictly between the raw mean and the prior
      assert((smooth - segMean) * (gm - segMean) >= 0.0,
        s"${r.getString(0)}: $smooth not between $segMean and $gm")
      assert(math.abs(smooth - gm) <= math.abs(segMean - gm) + 1e-9)
    }
  }

  test("one-hot: pinned vocabulary, exactly one flag and one status fire per row") {
    val out = Features.oneHot(spark, sf, limit = 500)
    assert(out.columns.toSeq === Seq("l_orderkey", "l_linenumber",
      "flag_a", "flag_n", "flag_r", "status_o", "status_f"))
    val bad = out.filter($"flag_a" + $"flag_n" + $"flag_r" =!= 1 ||
      $"status_o" + $"status_f" =!= 1).count()
    assert(bad === 0)
    // bounded output is a TakeOrderedAndProject, not a global sort
    val plan = Features.oneHot(spark, sf, limit = 500)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("hashed bag-of-words: buckets in [0,16), counts conserve the token volume") {
    val out = Features.hashedBagOfWords(spark, sf).cache()
    val r = out.agg(min($"bucket"), max($"bucket"), sum($"n")).head
    assert(r.getInt(0) >= 0 && r.getInt(1) < 16)
    val totalTokens = graft.sources.Tables.documents(spark, sf)
      .select(size(graft.ops.Text.tokens($"text")).cast("long").as("k"))
      .agg(sum($"k")).head.getLong(0)
    assert(r.getLong(2) === totalTokens) // no token lost or double-counted
    out.unpersist()
  }

  test("user profile: per-type counts partition n_events, recency anchored at the watermark") {
    val out = Features.userProfile(spark, sf).cache()
    val bad = out.filter(
      $"n_click" + $"n_view" + $"n_purchase" + $"n_signup" + $"n_error"
        =!= $"n_events").count()
    assert(bad === 0)
    val r = out.agg(min($"recency_ms"), count(lit(1))).head
    assert(r.getLong(0) === 0L) // the user holding the corpus's last event
    assert(r.getLong(1) ===
      graft.sources.Tables.events(spark, sf)
        .select($"user_id").distinct().count())
    out.unpersist()
  }

  test("pit training set: prior-window features match a strict happened-before recompute") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"ts", $"event_type", $"value")
    // independent recompute of the point-in-time cutoff via an explicit
    // happened-before self-join — any future leakage in the window frame
    // (an off-by-one, a CURRENT ROW inclusion) shows as a count mismatch
    val prior = ev.as("e").join(ev.as("p"),
        $"e.user_id" === $"p.user_id" &&
          ($"p.ts" < $"e.ts" ||
            ($"p.ts" === $"e.ts" && $"p.event_id" < $"e.event_id")), "left")
      .groupBy($"e.event_id".as("event_id"))
      .agg(count($"p.event_id").as("n_prior_ref"),
        count(when($"p.event_type" === "purchase", 1)).as("n_pp_ref"))
    val out = Features.pitTrainingSet(spark, sf)
    val joined = out.join(prior, "event_id")
    assert(joined.count() > 0)
    assert(joined.filter($"n_prior" =!= $"n_prior_ref" ||
      $"n_prior_purchases" =!= $"n_pp_ref").count() === 0)
  }

  test("feature cross: buckets bounded, counts conserve orders, crosses conserved") {
    val out = Features.crossFeatures(spark, sf).cache()
    val r = out.agg(min($"bucket"), max($"bucket"), sum($"n"),
      sum($"n_crosses")).head
    assert(r.getInt(0) >= 0 && r.getInt(1) < 32)
    val joined = graft.sources.Tables.orders(spark, sf)
      .join(graft.sources.Tables.customer(spark, sf),
        $"o_custkey" === $"c_custkey")
    assert(r.getLong(2) === joined.count())
    assert(r.getLong(3) === joined
      .select(concat_ws("|", $"c_mktsegment", $"o_orderpriority")).distinct()
      .count())
    out.unpersist()
  }

  test("tf-idf: k rows per doc, ranks 1..k, corpus-wide stopwords score ~0") {
    val out = Features.tfidfTopTerms(spark, sf, k = 3).cache()
    val byDoc = out.groupBy($"doc_id").agg(count(lit(1)).as("c"),
      min($"rk").as("lo"), max($"rk").as("hi"))
    assert(byDoc.filter($"c" =!= 3 || $"lo" =!= 1 || $"hi" =!= 3).count() === 0)
    // a token present in EVERY document has idf = ln(1) = 0, so it can
    // never outrank a informative token with tfidf > 0
    val worst = out.agg(min($"tfidf")).head.getDouble(0)
    assert(worst >= 0.0)
    // scores are non-increasing down the ranking inside each doc
    val inverted = out.as[(Long, Long, String, Long, Long, Double)]
      .groupByKey(_._1).flatMapGroups { (_, it) =>
        val rows = it.toSeq.sortBy(_._2)
        rows.sliding(2).collect {
          case Seq(a, b) if a._6 < b._6 => (a._1, a._2)
        }
      }.count()
    assert(inverted === 0)
    out.unpersist()
  }

  test("categorical association: matches a driver-side contingency recompute") {
    val r = Features.categoricalAssociation(spark, sf).collect().head
    val joint = graft.sources.Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag", $"l_linestatus").count().collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    val n = joint.map(_._3).sum.toDouble
    val mx = joint.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val my = joint.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val mi = joint.map { case (x, y, c) =>
      (c / n) * math.log(c * n / (mx(x).toDouble * my(y))) }.sum
    val chi2 = joint.map { case (x, y, c) =>
      val e = mx(x).toDouble * my(y) / n; math.pow(c - e, 2) / e }.sum
    assert(r.getAs[Long]("n") === n.toLong)
    assert(math.abs(r.getAs[Double]("mi") - mi) < 1e-5)
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-3)
    // MI and chi2 are non-negative; V in [0, 1]
    assert(r.getAs[Double]("mi") >= -1e-9)
    assert(r.getAs[Double]("chi2") >= 0.0)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0 + 1e-9)
  }

  test("anova screen: F matches a driver-side recompute, groups complete") {
    val out = Features.anovaScreen(spark, sf).collect()
    val vals = graft.sources.Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_extendedprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    val byG = vals.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(out.map(_.getString(0)).toSet === byG.keySet)
    val n = vals.length.toDouble
    val grand = vals.map(_._2).sum / n
    val k = byG.size
    def mean(xs: Array[Double]) = xs.sum / xs.length
    val ssb = byG.values.map(xs => xs.length * math.pow(mean(xs) - grand, 2)).sum
    val ssw = byG.values.map(xs => {
      val m = mean(xs); xs.map(x => math.pow(x - m, 2)).sum
    }).sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(out.head.getAs[Double]("f_stat") - f) < 1e-3 * math.max(1.0, f))
    out.foreach(r => assert(r.getAs[Long]("n_g") === byG(r.getString(0)).length.toLong))
  }

  test("latest snapshot: one row per user, equals the window-recompute, agg plan") {
    val out = Features.latestEventSnapshot(spark, sf).cache()
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(out.count() === users)
    // semantic reference: row_number over (ts desc, event_id desc)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".desc, $"event_id".desc)
    val ref = graft.sources.Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"event_id".as("last_event_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = out.select($"user_id", $"last_event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === ref)
    // the operator is an aggregate (arg-max), not a window sort
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    out.unpersist()
  }

  test("psi drift: bins cover the table, terms replay, stable split stays calm") {
    val out = Features.psiDrift(spark, sf).collect()
    val nOrders = graft.sources.Tables.orders(spark, sf).count()
    assert(out.map(r => r.getLong(1) + r.getLong(2)).sum === nOrders)
    out.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) <= 9))
    // driver replay of the smoothed PSI contribution per bin
    val tRef = out.map(_.getLong(1)).sum.toDouble
    val tCur = out.map(_.getLong(2)).sum.toDouble
    out.foreach { r =>
      val p = (r.getLong(1) + 0.5) / (tRef + 5.0)
      val q = (r.getLong(2) + 0.5) / (tCur + 5.0)
      val expect = math.floor((p - q) * math.log(p / q) * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("psi_term") === expect, r)
    }
    // TPC-H order prices are date-independent: the split must read stable
    val psi = out.map(_.getAs[Double]("psi_term")).sum
    assert(psi >= 0.0 && psi < 0.1, psi)
  }

  test("winsorize: bounds, clamp counts and means equal a driver replay") {
    val out = Features.winsorize(spark, sf).collect()
    assert(out.nonEmpty)
    val raw = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def pct(xs: Array[Double], p: Double): Double = {
      val h = (xs.length - 1) * p
      val i = h.toInt
      if (i + 1 >= xs.length) xs(i) else xs(i) + (h - i) * (xs(i + 1) - xs(i))
    }
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    out.foreach { r =>
      val xs = raw(r.getString(0)).toArray
      val (lo, hi) = (r4(pct(xs, 0.05)), r4(pct(xs, 0.95)))
      assert(r.getDouble(1) === lo && r.getDouble(2) === hi)
      assert(r.getLong(3) === xs.length.toLong)
      assert(r.getLong(4) === xs.count(_ < lo).toLong)
      assert(r.getLong(5) === xs.count(_ > hi).toLong)
      assert(r.getDouble(6) === r4(xs.sum / xs.length))
      val w = xs.map(x => math.min(math.max(x, lo), hi))
      assert(r.getDouble(7) === r4(w.sum / w.length))
      // clamping towards the body can only pull the mean inward
      assert(r.getLong(4) + r.getLong(5) > 0)
    }
  }
}
