package graft.graph

/** Driver-local bottom-out for the batched Brandes family
  * ([[Betweenness]]) — the r19 verdict's item 4: at fixture/cone scale
  * the distributed operator is pure scheduling (87-89 Spark jobs over a
  * 30-node graph, ~50 ms each), while the arithmetic is microseconds.
  * Same cutoff discipline as [[LocalGraph]] (`spark.graft.graph.
  * localSolveMaxEdges`, 0 disables); above the cutoff the distributed
  * rounds run unchanged.
  *
  * Bit-exactness contract (parity-spec'd in LocalBrandesSpec against the
  * distributed operator with the cutoff disabled):
  *
  *  - the edge view is the caller's already-symmetrized distinct (a, b)
  *    set, so both paths see the identical graph;
  *  - forward sigma is a Long sum over predecessor sigmas per BFS level —
  *    Java Long addition is the same operation Spark's `sum(LongType)`
  *    applies (wrap semantics included, ANSI off);
  *  - the backward term replays
  *    `(CAST(sv AS DECIMAL(38,0)) * (1000000 + dw)) div sw` as
  *    BigInt multiply + quotient (exact; positive operands, so the
  *    truncation direction matches), narrowed to Long like IntegralDivide;
  *  - per-node accumulations are Long sums of those terms —
  *    order-independent, so serial order == any shuffle order;
  *  - the guards ([[Betweenness.SigmaBound]], the pre-round wrap check,
  *    the strict maxDepth check) fire on the same conditions with the
  *    same exception type, so local and distributed runs fail alike.
  */
private[graph] object LocalBrandes {

  final class Solved(
      val nodes: Array[String],                  // every endpoint, first-seen order
      val bcM: Array[Long],                      // per node, aligned with nodes
      val hcM: Array[Long],                      // per node, aligned with nodes
      val eccBySource: Array[(String, Long, Long)]) // (source, ecc, n_reached)

  /** Run the full batched forward+backward for `sources` over the
    * symmetric distinct edge array. Throws exactly where the distributed
    * operator does (sigma bound, wrap guard, strict depth cap). */
  def solve(edges: Array[(String, String)], sources: Seq[String],
      maxDepth: Int, strict: Boolean): Solved = {
    require(sources.nonEmpty, "need at least one source")
    // ---- index nodes, build CSR adjacency over the directed pair set ----
    val idx = new java.util.LinkedHashMap[String, Integer]()
    def id(s: String): Int = {
      val v = idx.get(s)
      if (v != null) v.intValue()
      else { val n = idx.size(); idx.put(s, Integer.valueOf(n)); n }
    }
    val srcs = new Array[Int](edges.length)
    val dsts = new Array[Int](edges.length)
    var i = 0
    while (i < edges.length) {
      srcs(i) = id(edges(i)._1); dsts(i) = id(edges(i)._2); i += 1
    }
    val n = idx.size()
    val names = new Array[String](n)
    idx.forEach((k, v) => names(v.intValue()) = k)
    val deg = new Array[Int](n)
    srcs.foreach(deg(_) += 1)
    val off = new Array[Int](n + 1)
    i = 0
    while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
    val adj = new Array[Int](edges.length)
    val fill = java.util.Arrays.copyOf(off, n)
    i = 0
    while (i < edges.length) {
      val s = srcs(i); adj(fill(s)) = dsts(i); fill(s) += 1; i += 1
    }
    // guard constants, exactly as the distributed forward() derives them
    val m = math.max(1L, edges.length.toLong)
    lazy val maxInDeg = {
      val d = new Array[Long](n)
      dsts.foreach(d(_) += 1L)
      var mx = 0L; d.foreach(x => if (x > mx) mx = x); math.max(1L, mx)
    }
    def checkNoWrap(prevMax: Long, depth: Int): Unit =
      if (prevMax > Long.MaxValue / m && prevMax > Long.MaxValue / maxInDeg)
        throw new IllegalStateException(
          s"max sigma $prevMax × max in-degree $maxInDeg could wrap a " +
            s"Long at depth $depth — equal-path structure too dense for " +
            "64-bit accumulation; sample fewer/other sources")

    // ---- forward: per-source level-synchronous BFS, batch-global guards ----
    val srcList = sources.distinct.toArray
    val k = srcList.length
    val dist = Array.fill(k)(new java.util.HashMap[Integer, Integer]())
    val sigma = Array.fill(k)(new java.util.HashMap[Integer, java.lang.Long]())
    // per source: levels(d) = nodes first reached at depth d (insertion order)
    val levels = Array.fill(k)(
      scala.collection.mutable.ArrayBuffer.empty[Array[Int]])
    val frontier = new Array[Array[Int]](k)
    var si = 0
    while (si < k) {
      val sNode = idx.get(srcList(si))
      if (sNode != null) {
        dist(si).put(sNode, Integer.valueOf(0))
        sigma(si).put(sNode, java.lang.Long.valueOf(1L))
        frontier(si) = Array(sNode.intValue())
      } else {
        // a source absent from the edge set: the distributed frontier row
        // (s, s, 1) joins no edge — an isolated layer-0 node. Track it
        // with a sentinel id -1 so eccentricity still reports it.
        frontier(si) = Array.empty[Int]
      }
      levels(si) += frontier(si)
      si += 1
    }
    var prevMaxSigma = 1L
    var alive = frontier.exists(_.nonEmpty)
    var d = 0
    while (alive && d < maxDepth) {
      d += 1
      checkNoWrap(prevMaxSigma, d)
      var roundMax = 0L
      var any = false
      si = 0
      while (si < k) {
        if (frontier(si).nonEmpty) {
          // sum sigma into nodes NOT yet visited (the anti-join); a node
          // touched by several predecessors this round accumulates
          val acc = new java.util.LinkedHashMap[Integer, java.lang.Long]()
          frontier(si).foreach { v =>
            val sv = sigma(si).get(Integer.valueOf(v)).longValue()
            var p = off(v)
            while (p < off(v + 1)) {
              val w = Integer.valueOf(adj(p))
              if (!dist(si).containsKey(w)) {
                val cur = acc.get(w)
                acc.put(w, java.lang.Long.valueOf(
                  (if (cur == null) 0L else cur.longValue()) + sv))
              }
              p += 1
            }
          }
          val lvl = new Array[Int](acc.size())
          var j = 0
          val it = acc.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            dist(si).put(e.getKey, Integer.valueOf(d))
            sigma(si).put(e.getKey, e.getValue)
            if (e.getValue.longValue() > roundMax) roundMax = e.getValue.longValue()
            lvl(j) = e.getKey.intValue(); j += 1
          }
          frontier(si) = lvl
          if (lvl.nonEmpty) any = true
        }
        si += 1
      }
      // layer d recorded only when non-empty somewhere — the distributed
      // loop appends `nxt` only while alive > 0; per source an empty
      // frontier simply stops contributing
      if (any) {
        si = 0
        while (si < k) { levels(si) += frontier(si); si += 1 }
        if (roundMax > Betweenness.SigmaBound)
          throw new IllegalStateException(
            s"shortest-path count sigma=$roundMax exceeds " +
              s"${Betweenness.SigmaBound} at depth $d — equal-path " +
              "structure too dense for 64-bit accumulation; sample " +
              "fewer/other sources")
        prevMaxSigma = roundMax
      }
      alive = any
    }
    if (strict && alive)
      throw new IllegalStateException(
        s"BFS still expanding at maxDepth=$maxDepth — " +
          "raise maxDepth or pass strict=false")

    // ---- backward: deepest layer first, exact decimal term ----
    val bc = new Array[Long](n)
    val hc = new Array[Long](n)
    val Scale = Betweenness.Scale
    val ecc = new Array[(String, Long, Long)](k)
    si = 0
    while (si < k) {
      val lv = levels(si)
      val depths = lv.length // layers 0..depths-1
      val delta = new java.util.HashMap[Integer, java.lang.Long]()
      // deepest layer delta = 0; contributes (as zeros) when depths > 1
      var dep = depths - 1
      while (dep >= 0) {
        val layer = lv(dep)
        if (dep < depths - 1) {
          layer.foreach { v =>
            var term = 0L
            val sv = sigma(si).get(Integer.valueOf(v)).longValue()
            var p = off(v)
            while (p < off(v + 1)) {
              val w = adj(p)
              val dw = dist(si).get(Integer.valueOf(w))
              if (dw != null && dw.intValue() == dep + 1) {
                val deltaW = {
                  val x = delta.get(Integer.valueOf(w))
                  if (x == null) 0L else x.longValue()
                }
                val sw = sigma(si).get(Integer.valueOf(w)).longValue()
                val q = (BigInt(sv) * BigInt(1000000L + deltaW)) / BigInt(sw)
                term += q.longValue
              }
              p += 1
            }
            delta.put(Integer.valueOf(v), java.lang.Long.valueOf(term))
          }
        } else {
          layer.foreach(v =>
            delta.put(Integer.valueOf(v), java.lang.Long.valueOf(0L)))
        }
        // dist > 0 layers accumulate into bc (Brandes' v ≠ s rule) and,
        // for harmonic, Scale div depth per reached node
        if (dep > 0) {
          layer.foreach { v =>
            bc(v) += delta.get(Integer.valueOf(v)).longValue()
            hc(v) += Scale / dep
          }
        }
        dep -= 1
      }
      // eccentricity: max non-empty depth + count of reached nodes
      var maxD = 0L
      var reached = 0L
      var dd = 0
      while (dd < depths) {
        if (lv(dd).nonEmpty) { maxD = dd.toLong; reached += lv(dd).length }
        dd += 1
      }
      // a source absent from the edge set still reaches itself
      if (idx.get(srcList(si)) == null) reached += 1
      ecc(si) = (srcList(si), maxD, reached)
      si += 1
    }
    new Solved(names, bc, hc, ecc)
  }
}
