package graft.sim

import scala.collection.mutable
import graft.core._
import graft.functions.Urls

/**
 * The reference simulator — a serial, in-memory executable specification of
 * the anansi crawl loop (the C binary is not buildable in-sandbox; this is
 * the golden-trace generator, pinned to the C sources by the unit tests in
 * StepSpec/PolicySpec and by Step.scala's file:line cites).
 *
 * Time is logical: one scheduling round ≙ one reference wall-second (the
 * crawl thread sleeps 1 s per fetch, crawler/thread.c:335-341; politeness
 * floor is 1 s, db.c:771-779). Within a round the simulator dequeues at
 * most one URL per host — the reference's per-host serialization emerges
 * from the `earliest_update` advance inside the dequeue txn (db.c:762-790);
 * with a ≥1 s rate floor a host can never be dequeued twice within one
 * logical second, so the round construction is order-equivalent to the
 * serial loop. Cross-host emission order within a round is the reference's
 * A1 composite sort (db.c:681-692) applied to the selected rows.
 *
 * Round semantics (shared verbatim with the Spark engine):
 *  - picks are computed from the frontier/hosts state at round start;
 *  - per-host winner = min by (state=='NEW' DESC, next_fetch ASC, url ASC)
 *    — earliest_update and rate are per-host constants;
 *  - emission order = (state=='NEW' DESC, earliest_update ASC,
 *    next_fetch ASC, rate ASC, url ASC) over the winners;
 *  - updates (politeness advance, fetch outcome) apply immediately per
 *    pick; discovered URLs buffer and insert at end of round, in harvest
 *    order (visible from round r+1 — matching batch semantics).
 */
final class Simulator(web: Map[String, Step.WebEntry], cfg: CrawlConfig) {

  val frontier  = mutable.LinkedHashMap.empty[String, FrontierEntry] // url_hash →
  val hosts     = mutable.LinkedHashMap.empty[String, HostEntry]     // root_hash →
  val fetchLog  = mutable.Map.empty[String, Step.CachedInfo]         // url_hash →
  val extracted = mutable.Map.empty[String, String]                  // url → text
  val trace     = mutable.ArrayBuffer.empty[TraceRow]
  private var seq = 0L
  /** Global round counter — continues across run() calls (matches the
    * Spark driver's roundNo so traces stay comparable over clock jumps). */
  private var roundNo = 0

  /** Seed/discovered add — insert-if-absent (db.c:1202-1294). */
  def addUrl(raw: String, now: Long, force: Boolean = false): Unit =
    Step.newFrontierEntry(raw, now, force).foreach { fe =>
      frontier.get(fe.url_hash) match {
        case Some(existing) =>
          if (force) // J3 force upsert (db.c:1219-1231)
            frontier(fe.url_hash) =
              existing.copy(next_fetch = now, state = CrawlState.Force)
        case None =>
          frontier(fe.url_hash) = fe
          Step.newHostEntry(fe.url, now, cfg).foreach { he =>
            if (!hosts.contains(he.root_hash)) hosts(he.root_hash) = he
          }
      }
    }

  /** Ordering keys shared with the Spark engine (Step.hostKey/emitKey). */
  private def hostKey(f: FrontierEntry) = Step.hostKey(f)
  private def emitKey(f: FrontierEntry, h: HostEntry) = Step.emitKey(f, h)

  /** The picks a round would make from the current state (pure). */
  def picksAt(now: Long): Seq[FrontierEntry] = {
    val eligibleHosts = hosts.values
      .filter(h => h.rate > 0 && h.earliest_update < now)
      .map(h => h.root_hash -> h).toMap
    frontier.values
      .filter(f => f.next_fetch < now && eligibleHosts.contains(f.root_hash))
      .groupBy(_.root_hash).values.map(_.minBy(hostKey)).toSeq
      .sortBy(f => emitKey(f, eligibleHosts(f.root_hash)))
  }

  /** Run `rounds` scheduling rounds starting at logical time `t0`. May be
    * called repeatedly with later t0 (clock jumps model TTL expiry). */
  def run(t0: Long, rounds: Int): Unit = {
    var round = 0
    while (round < rounds && seq < cfg.budget) {
      val now = t0 + round
      val discovered = mutable.ArrayBuffer.empty[String]
      picksAt(now).foreach { pick =>
        if (seq < cfg.budget) {
          trace += TraceRow(seq, roundNo, pick.url, pick.state)
          seq += 1
          // A2 politeness advance inside the dequeue (db.c:762-790)
          hosts(pick.root_hash) =
            Step.politenessAdvance(hosts(pick.root_hash), now)
          val robotsBody =
            if (!cfg.robotsEnabled) None
            else graft.functions.Urls.canonicalRoot(pick.url)
              .flatMap(r => web.get(graft.functions.Robots.robotsUrl(r)))
              .filter(_.status == 200).map(_.body)
          val res = Step.fetchAndProcess(pick.url, pick.state, now,
            fetchLog.get(pick.url_hash), web.get(pick.url), cfg, robotsBody)
          if (res.commit) {
            fetchLog(pick.url_hash) = Step.CachedInfo(now, res.status)
            res.extractedText.foreach(t => extracted(pick.url) = t)
          }
          res.path match {
            case Step.Path.Updated | Step.Path.Failed =>
              frontier(pick.url_hash) = Step.frontierUpdated(
                pick, now, res.status, res.ttlArg, res.state)
              hosts(pick.root_hash) =
                Step.rootUpdated(hosts(pick.root_hash), now)
            case Step.Path.Unchanged =>
              frontier(pick.url_hash) =
                Step.frontierUnchanged(pick, now, error = false)
              hosts(pick.root_hash) =
                Step.rootUnchanged(hosts(pick.root_hash), now)
          }
          discovered ++= res.outlinks
        }
      }
      discovered.foreach(addUrl(_, now))
      round += 1
      roundNo += 1
    }
  }

  def seenSet: Set[String] = frontier.keySet.toSet
}
