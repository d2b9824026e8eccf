package graft

/** Exact-value coverage for graph_pagerank: replay the md5 edge
  * derivation and all 5 quantized iterations single-threaded and compare
  * bit-for-bit, then check the probability-mass invariant. */
class GraphSpec extends SparkSpec {

  private def q9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  test("graph_pagerank replays a driver-side quantized power iteration") {
    val got = SparkEntry.queries("graph_pagerank")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = got.size
    assert(n == 500)

    // identical edge derivation (md5 of "src:i", first 8 hex chars, mod N)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(sx: String): Long = {
      val d = md.digest(sx.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val edges = (0 until n).flatMap { src =>
      (1 to 3).map(i => src.toLong -> (h(s"$src:$i") % n))
    }
    var rank = (0 until n).map(i => i.toLong -> 1.0 / n).toMap
    for (_ <- 1 to 5) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        // the engine's dsum(…, 9): per-row quantize to long, exact long sum
        dst -> es.map(e => math.floor(rank(e._1) / 3.0 * 1e9 + 0.5).toLong)
          .sum / 1e9
      }
      rank = (0 until n).map { i =>
        i.toLong -> q9(0.15 / n + 0.85 * in.getOrElse(i.toLong, 0.0))
      }.toMap
    }
    assert(got == rank)
    // probability mass: sum of ranks ~ 1 (within quantization slack)
    assert(math.abs(got.values.sum - 1.0) < 1e-5)
    // teleport floor: no rank below 0.15/N
    assert(got.values.forall(_ >= 0.15 / n - 1e-9))
    // the graph is non-degenerate: ranks genuinely differ
    assert(got.values.toSet.size > 100)
  }

  test("graph_hits replays a driver-side quantized 3-iteration HITS") {
    val got = SparkEntry.queries("graph_hits")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val n = got.size
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(sx: String): Long = {
      val d = md.digest(sx.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val edges = (0 until n).flatMap { src =>
      (1 to 3).map(i => src.toLong -> (h(s"$src:$i") % n))
    }
    // engine's dsum(…, 6) per group: quantize each term, exact long sum
    def q6sum(xs: Seq[Double]): Double =
      xs.map(x => math.floor(x * 1e6 + 0.5).toLong).sum / 1e6
    var hub = (0 until n).map(i => i.toLong -> 1.0).toMap
    var auth = Map.empty[Long, Double]
    for (_ <- 1 to 3) {
      val aIn = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> q6sum(es.map(e => hub(e._1))) }
      auth = (0 until n).map(i =>
        i.toLong -> aIn.getOrElse(i.toLong, 0.0)).toMap
      val hIn = edges.groupBy(_._1).map { case (src, es) =>
        src -> q6sum(es.map(e => auth(e._2))) }
      hub = (0 until n).map(i =>
        i.toLong -> hIn.getOrElse(i.toLong, 0.0)).toMap
    }
    // grain-2 norm sums (the long-sum-capacity choice), grain-9 output
    def norm(m: Map[Long, Double]): Double = math.sqrt(
      m.values.map(x => math.floor(x * x * 100 + 0.5).toLong).sum / 100.0)
    val (na, nh) = (norm(auth), norm(hub))
    val want = (0 until n).map { i =>
      i.toLong -> (q9(auth(i.toLong) / na), q9(hub(i.toLong) / nh)) }.toMap
    assert(got == want)
    // L2 invariants and non-degeneracy
    assert(math.abs(got.values.map(v => v._1 * v._1).sum - 1.0) < 1e-6)
    assert(math.abs(got.values.map(v => v._2 * v._2).sum - 1.0) < 1e-6)
    assert(got.values.map(_._1).toSet.size > 100)
  }

  test("graph_triangles replays a driver-side enumeration") {
    val got = SparkEntry.queries("graph_triangles")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = 500
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(sx: String): Long = {
      val d = md.digest(sx.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val edges = (0 until n).flatMap { src =>
      (1 to 3).map { i =>
        val dst = h(s"$src:$i") % n
        (math.min(src.toLong, dst), math.max(src.toLong, dst))
      }
    }.filter(e => e._1 < e._2).toSet
    val adj = edges.groupBy(_._1).map { case (a, es) => a -> es.map(_._2) }
    val counts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      (a, bs) <- adj.toSeq
      b <- bs
      c <- adj.getOrElse(b, Set.empty)
      if edges.contains((a, c))
    } {
      counts(a) += 1; counts(b) += 1; counts(c) += 1
    }
    assert(got == counts.toMap, s"sizes: got ${got.size} vs ${counts.size}")
    // every count is per-node triangle participation: total divides by 3
    assert(got.values.sum % 3 == 0)
  }

  test("graph_clustering_coeff replays 2T/(d(d-1)) against the triangle enumeration") {
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val got = SparkEntry.queries("graph_clustering_coeff")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val n = 500
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(sx: String): Long = {
      val d = md.digest(sx.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val edges = (0 until n).flatMap { src =>
      (1 to 3).map { i =>
        val dst = h(s"$src:$i") % n
        (math.min(src.toLong, dst), math.max(src.toLong, dst))
      }
    }.filter(e => e._1 < e._2).toSet
    val adj = edges.groupBy(_._1).map { case (a, es) => a -> es.map(_._2) }
    val tri = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      (a, bs) <- adj.toSeq; b <- bs
      c <- adj.getOrElse(b, Set.empty) if edges.contains((a, c))
    } { tri(a) += 1; tri(b) += 1; tri(c) += 1 }
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = deg.map { case (v, d) =>
      val t = tri(v)
      v -> ((d, t, if (d >= 2) q6(2.0 * t / (d * (d - 1))) else 0.0))
    }
    assert(got == want)
    assert(got.values.forall { case (_, _, c) => c >= 0.0 && c <= 1.0 })
  }

  test("graph_degree_dist replays the in-degree histogram incl. zero-degree nodes") {
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val got = SparkEntry.queries("graph_degree_dist")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val n = 500
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(sx: String): Long = {
      val d = md.digest(sx.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val indeg = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    (0 until n).foreach { src =>
      (1 to 3).foreach { i => indeg(h(s"$src:$i") % n) += 1 }
    }
    val byNode = (0 until n).map(v => indeg(v.toLong))
    val want = byNode.groupBy(identity).map { case (d, vs) =>
      d -> ((vs.size.toLong, q6(vs.size.toDouble / n))) }
    assert(got == want)
    // out-degree is constant 3, so in-degree mass must total 3n
    assert(got.map { case (d, (c, _)) => d * c }.sum == 3L * n)
    assert(got.contains(0L), "zero-in-degree nodes must be visible")
  }

  test("graph_cc_sizes aggregates graph_cc's labels exactly") {
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val labels = SparkEntry.queries("graph_cc")(spark, sfDir).collect()
      .map(r => r.getLong(1))
    val n = labels.length
    val want = labels.groupBy(identity).values.map(_.size)
      .groupBy(identity).map { case (size, comps) =>
        size.toLong -> ((comps.size.toLong, size.toLong * comps.size,
          q6(size.toDouble * comps.size / n))) }
    val got = SparkEntry.queries("graph_cc_sizes")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got == want)
    // every node lands in exactly one component
    assert(got.values.map(_._2).sum == n)
  }

  test("graph_labelprop replays 3 synchronous driver-side rounds") {
    val got = SparkEntry.queries("graph_labelprop")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = 500
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(sx: String): Long = {
      val d = md.digest(sx.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val edges = (0 until n).flatMap { src =>
      (1 to 3).map { i =>
        val dst = h(s"$src:$i") % n
        (math.min(src.toLong, dst), math.max(src.toLong, dst))
      }
    }.filter(e => e._1 < e._2).toSet
    val nbr = scala.collection.mutable.Map[Long, Seq[Long]]()
      .withDefaultValue(Seq.empty)
    edges.foreach { case (a, b) =>
      nbr(a) = nbr(a) :+ b; nbr(b) = nbr(b) :+ a
    }
    var lab: Map[Long, Long] = (0L until n.toLong).map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      lab = nbr.toMap.map { case (v, ns) =>
        val counts = ns.groupBy(lab).map { case (l, xs) => (l, xs.size) }
        v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      } ++ (0L until n.toLong).filterNot(nbr.contains).map(v => v -> v)
    }
    assert(got == lab)
    // propagation actually merges communities: fewer labels than nodes
    assert(got.values.toSet.size < n)
  }

  test("graph_modularity replays the Newman Q over the labelprop partition") {
    val row = SparkEntry.queries("graph_modularity")(spark, sfDir)
      .collect().head
    val n = 500
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(sx: String): Long = {
      val d = md.digest(sx.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val edges = (0 until n).flatMap { src =>
      (1 to 3).map { i =>
        val dst = h(s"$src:$i") % n
        (math.min(src.toLong, dst), math.max(src.toLong, dst))
      }
    }.filter(e => e._1 < e._2).toSet
    val nbr = scala.collection.mutable.Map[Long, Seq[Long]]()
      .withDefaultValue(Seq.empty)
    edges.foreach { case (a, b) =>
      nbr(a) = nbr(a) :+ b; nbr(b) = nbr(b) :+ a
    }
    var lab: Map[Long, Long] = (0L until n.toLong).map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      lab = nbr.toMap.map { case (v, ns) =>
        val counts = ns.groupBy(lab).map { case (l, xs) => (l, xs.size) }
        v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      } ++ (0L until n.toLong).filterNot(nbr.contains).map(v => v -> v)
    }
    val m = edges.size
    val inner = edges.count { case (a, b) => lab(a) == lab(b) }
    val dsums = (0L until n.toLong).groupBy(lab)
      .map { case (_, vs) => vs.map(v => nbr(v).size.toLong).sum }
    val sd2 = dsums.map(d => BigInt(d) * d).sum
    val q = math.floor(
      (inner * 1.0 / m - sd2.toDouble / (4.0 * m * m)) * 1e6 + 0.5) / 1e6
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == m.toLong)
    assert(row.getLong(2) == dsums.size.toLong)
    assert(row.getLong(3) == inner.toLong)
    assert(row.getDouble(4) == q)
  }

  test("graph_assortativity replays the degree-pair Pearson exactly") {
    val row = SparkEntry.queries("graph_assortativity")(spark, sfDir)
      .collect().head
    val n = 500
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(sx: String): Long = {
      val d = md.digest(sx.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val edges = (0 until n).flatMap { src =>
      (1 to 3).map { i =>
        val dst = h(s"$src:$i") % n
        (math.min(src.toLong, dst), math.max(src.toLong, dst))
      }
    }.filter(e => e._1 < e._2).toSet
    val und = edges.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = und.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    val mm = und.size
    val sj = und.map(e => BigInt(deg(e._1))).sum
    val sjj = und.map(e => BigInt(deg(e._1)) * deg(e._1)).sum
    val sjk = und.map(e => BigInt(deg(e._1)) * deg(e._2)).sum
    val r = math.floor(
      ((BigInt(mm) * sjk - sj * sj).toDouble
        / (BigInt(mm) * sjj - sj * sj).toDouble) * 1e6 + 0.5) / 1e6
    assert(row.getLong(0) == mm.toLong)
    assert(row.getDouble(1) == r)
    // md5 wiring is degree-random: mixing must sit near zero, away
    // from genuinely assortative (>0.2) or disassortative (<-0.2)
    assert(math.abs(row.getDouble(1)) < 0.2)
  }

  test("graph_reciprocity replays the reversed-edge count") {
    val row = SparkEntry.queries("graph_reciprocity")(spark, sfDir)
      .collect().head
    val n = 500
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(sx: String): Long = {
      val d = md.digest(sx.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val ds = (0 until n).flatMap { src =>
      (1 to 3).map(i => (src.toLong, h(s"$src:$i") % n))
    }.filter(e => e._1 != e._2).toSet
    val recip = ds.count { case (a, b) => ds.contains((b, a)) }
    val r6 = math.floor(recip * 1.0 / ds.size * 1e6 + 0.5) / 1e6
    assert(row.getLong(0) == ds.size.toLong)
    assert(row.getLong(1) == recip.toLong)
    assert(row.getDouble(2) == r6)
    // random d-out wiring: a back-edge is a ~d/n event, so near zero
    assert(row.getDouble(2) < 0.05)
  }

  test("graph_kcore replays 4 driver-side peel rounds") {
    val got = SparkEntry.queries("graph_kcore")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = 500
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(sx: String): Long = {
      val d = md.digest(sx.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val edges = (0 until n).flatMap { src =>
      (1 to 3).map { i =>
        val dst = h(s"$src:$i") % n
        (math.min(src.toLong, dst), math.max(src.toLong, dst))
      }
    }.filter(e => e._1 < e._2).toSet
    def neighbors(alive: Set[Long]): Map[Long, Int] =
      edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .filter { case (u, v) => alive(u) && alive(v) }
        .groupBy(_._1).map { case (u, xs) => u -> xs.size }
    var alive = edges.flatMap(e => Seq(e._1, e._2))
    for (_ <- 1 to 4)
      alive = neighbors(alive).filter(_._2 >= 4).keySet
    val expected = neighbors(alive).map { case (u, d) => u -> d.toLong }
    assert(got == expected)
    // the peel genuinely removed something at k = 4
    assert(expected.size < n)
  }

  test("graph_bfs replays a driver-side 4-hop multi-source BFS") {
    val got = SparkEntry.queries("graph_bfs")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val n = got.size
    assert(n == 500)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(sx: String): Long = {
      val d = md.digest(sx.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val nbr = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    (0 until n).foreach { src =>
      (1 to 3).foreach { i =>
        val dst = h(s"$src:$i") % n
        if (src.toLong != dst) {
          nbr(src.toLong) = nbr(src.toLong) + dst
          nbr(dst) = nbr(dst) + src.toLong
        }
      }
    }
    var dist = Map(0L -> 0, 1L -> 0, 2L -> 0)
    for (_ <- 1 to 4) {
      val expanded = dist.toSeq.flatMap { case (u, d) =>
        nbr(u).toSeq.map(_ -> (d + 1)) :+ (u -> d)
      }
      dist = expanded.groupBy(_._1).map { case (u, ds) =>
        u -> ds.map(_._2).min
      }
    }
    val want = (0 until n).map(i => i.toLong ->
      dist.getOrElse(i.toLong, -1)).toMap
    assert(got == want)
    // structure sanity: seeds at 0; every positive dist has a neighbor
    // one hop closer; some node is genuinely unreached or at depth > 1
    assert(Seq(0L, 1L, 2L).forall(got(_) == 0))
    got.foreach { case (u, d) =>
      if (d > 0) assert(nbr(u).exists(v => got(v) == d - 1), s"node $u")
    }
    assert(got.values.exists(d => d == -1 || d >= 2))
  }

  test("graph_linkpred replays a driver-side common-neighbor scan") {
    val got = SparkEntry.queries("graph_linkpred")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Double]("score")))
    assert(got.length == 20)
    val n = 500
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(sx: String): Long = {
      val d = md.digest(sx.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val edges = (0 until n).flatMap { src =>
      (1 to 3).map { i =>
        val dst = h(s"$src:$i") % n
        (math.min(src.toLong, dst), math.max(src.toLong, dst))
      }
    }.filter(e => e._1 < e._2).toSet
    val nbr = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      nbr(a) = nbr(a) + b; nbr(b) = nbr(b) + a
    }
    val cand = for {
      (u, nu) <- nbr.toSeq
      m <- nu
      w <- nbr(m)
      if u < w && !edges.contains((u, w))
    } yield (u, w)
    val scored = cand.distinct.map { case (u, w) =>
      val cn = (nbr(u) & nbr(w)).size.toLong
      val jq = math.floor(
        cn * 1.0 / (nbr(u).size + nbr(w).size - cn) * 1e6 + 0.5).toLong
      (u, w, cn, jq)
    }
    val expected = scored.sortBy { case (u, w, _, jq) => (-jq, u, w) }
      .take(20).map { case (u, w, cn, jq) => (u, w, cn, jq / 1e6) }
    assert(got.toSeq == expected)
  }

  test("graph_cc replays a driver-side union-find over the residue subgraph") {
    val got = SparkEntry.queries("graph_cc")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = got.size
    assert(n == 500)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(sx: String): Long = {
      val d = md.digest(sx.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    // same derivation, kept only when src%16 == dst%16 (the shard cut)
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x; while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    for (src <- 0 until n; i <- 1 to 3) {
      val dst = (h(s"$src:$i") % n).toInt
      if (src % 16 == dst % 16) {
        val (a, b) = (find(src), find(dst))
        if (a != b) parent(math.max(a, b)) = math.min(a, b)
      }
    }
    val label = (0 until n)
      .groupBy(find).flatMap { case (_, ms) =>
        val m = ms.min.toLong; ms.map(_.toLong -> m)
      }
    assert(got == label)
    // the shard cut must leave genuinely many nontrivial components —
    // a single giant component would make the operator a constant
    val comps = got.values.toSet.size
    assert(comps > 50, s"only $comps components")
    assert(got.exists { case (d, c) => d != c }, "no nontrivial component")
  }
}
