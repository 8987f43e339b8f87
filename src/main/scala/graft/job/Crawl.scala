package graft.job

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1: the crawl's BFS frontier semantics as a distributed operator over a
  * pre-fetched LINKS table — `/root/reference/sidecar/crawler.py:128-205`:
  * seeds (sitemap + root) enter the visited set at enqueue time, the queue
  * drains FIFO, every newly-discovered same-origin link is enqueued once,
  * and the walk stops at `max_pages`. The network fetch is out of scope
  * (north rule: the input table replaces crawling); given the reference's
  * link structure as (src, dst) rows, this reproduces which pages the
  * crawl REACHES and at which BFS level.
  *
  * Shape: level-synchronous BFS — per level one hash join (links ⋈
  * frontier) + one anti-join against visited, both on url; each level's
  * result is localCheckpoint'ed so the iterative plan/lineage stays flat
  * (the classic iterative-Spark failure mode is a plan that doubles per
  * iteration). The per-level driver `isEmpty` is a control-flow check on
  * an already-materialized (checkpointed) frame, not a data collect.
  *
  * The reference's `max_pages` cap cuts in FIFO discovery order; a
  * distributed BFS has no global FIFO, so [[capPages]] cuts by
  * (depth, url) — identical set whenever the cap lands on a level
  * boundary, documented delta otherwise (the reference itself is
  * nondeterministic there: its order depends on intra-page link order).
  *
  * robots.txt composition: the reference gates at DEQUEUE time, so a
  * disallowed page is never fetched and contributes no links — reproduce
  * that by pre-filtering the links table on the SOURCE side:
  * `links.filter(rules.allowedColumn(agent, col("src")))`; disallowed
  * pages then still appear as discovered leaves, exactly like the
  * reference's visited set.
  */
object Crawl {

  /** BFS over `links(src, dst)` from `seeds`, up to `maxDepth` levels.
    * Returns (url, depth) with depth = first-discovery level (the min
    * BFS distance). */
  def bfs(links: DataFrame, seeds: Seq[String], maxDepth: Int): DataFrame = {
    val spark = links.sparkSession
    import spark.implicits._
    // materialize the edge table once: every level joins against it, and
    // without this an expensive upstream plan (scans, aggregates, unions)
    // would re-execute per level
    val edges = links.select(col("src"), col("dst")).localCheckpoint(true)
    var visited = seeds.toDF("url").distinct()
      .select(col("url"), lit(0).as("depth"))
      .localCheckpoint(true)
    var frontier = visited
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      val next = edges.join(frontier.select(col("url").as("src")), "src")
        .select(col("dst").as("url"))
        .distinct()
        .join(visited.select("url"), Seq("url"), "left_anti")
        .select(col("url"), lit(depth).as("depth"))
        .localCheckpoint(true)
      visited = visited.unionByName(next).localCheckpoint(true)
      frontier = next
    }
    visited
  }

  /** The `max_pages` cut over a bfs result: keep the first `maxPages` by
    * (depth, url) — top-k (TakeOrderedAndProject), never a global window. */
  def capPages(bfsOut: DataFrame, maxPages: Int): DataFrame =
    bfsOut.orderBy(col("depth"), col("url")).limit(maxPages)
}
