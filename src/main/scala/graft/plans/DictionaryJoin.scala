package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Contains, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.unsafe.types.UTF8String
import graft.text.AhoCorasick

/** Dictionary-join planner strategy (SURVEY §4's "candidate custom
  * Strategy": rewrite `text LIKE/contains dictionary` joins into
  * automaton scans).
  *
  * `docs JOIN vocab ON contains(docs.text, vocab.surface)` plans as a
  * BroadcastNestedLoopJoin — O(|docs|·|vocab|) `contains` calls, each
  * O(|text|·|surface|). This strategy plans the same logical join as
  * ONE Aho-Corasick pass per document: collect the (small) vocabulary
  * side, build the automaton on the driver, broadcast it, stream the
  * document side through it — O(|docs|·|text| + matches). Semantics are
  * identical to the nested-loop join (inner, duplicate surfaces yield
  * duplicate output rows; a surface matching twice in one text still
  * yields one row per (doc, surface) pair, exactly like `contains`).
  *
  * Registered via [[graft.GraftExtensions]]
  * (`injectPlannerStrategy`).
  */
object DictionaryJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, jt, Some(Contains(textExpr, surfaceExpr)), _)
        if (jt == Inner || jt == LeftSemi || jt == LeftAnti) &&
          textExpr.references.subsetOf(left.outputSet) &&
          surfaceExpr.references.subsetOf(right.outputSet) =>
      AutomatonJoinExec(planLater(left), planLater(right), textExpr, surfaceExpr, jt) :: Nil
    case _ => Nil
  }
}

/** Physical automaton join: builds the Aho-Corasick automaton from the
  * collected build side, broadcasts it, and emits one joined row per
  * (streamed row, matching build row) — or, for LeftSemi/LeftAnti, the
  * left row alone when a match exists / doesn't. Anti-join null
  * semantics follow BroadcastNestedLoopJoin exactly: contains(null, s)
  * is null (not TRUE), so null-text rows have no matching right row and
  * ARE emitted by anti. */
case class AutomatonJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    textExpr: Expression,
    surfaceExpr: Expression,
    joinType: JoinType = Inner,
) extends BinaryExecNode {

  override def output: Seq[Attribute] = joinType match {
    case LeftSemi | LeftAnti => left.output
    case _ => left.output ++ right.output
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val surfaceBound = BindReferences.bindReference(surfaceExpr, right.output)
    // collect + index the dictionary side (small by contract — the same
    // assumption BroadcastNestedLoopJoin's broadcast side makes)
    val buildRows = right.executeCollect()
    val builder = AhoCorasick.builder[List[InternalRow]]
    // contains(text, '') is TRUE for every non-null text — empty-string
    // surfaces can't live in the automaton (it has no empty patterns),
    // so they are collected separately and emitted for every left row,
    // keeping this strategy result-identical to BroadcastNestedLoopJoin.
    val emptySurfaceRows = List.newBuilder[InternalRow]
    buildRows.foreach { row =>
      val s = surfaceBound.eval(row)
      if (s != null) {
        val surface = s.asInstanceOf[UTF8String].toString
        if (surface.nonEmpty)
          builder.add(surface, List(row.copy()), (old, add) => add.head :: old)
        else emptySurfaceRows += row.copy()
      }
    }
    val automaton = builder.build()
    val bc = sparkContext.broadcast(automaton)
    val bcEmpty = sparkContext.broadcast(emptySurfaceRows.result())
    val textBound = BindReferences.bindReference(textExpr, left.output)

    val jt = joinType
    left.execute().mapPartitions { iter =>
      val auto = bc.value
      val always = bcEmpty.value
      jt match {
        case LeftSemi | LeftAnti =>
          val wantMatch = jt == LeftSemi
          iter.filter { leftRow =>
            val t = textBound.eval(leftRow)
            // null text: contains(null, s) is null, never TRUE — no
            // match, so semi drops the row and anti keeps it
            val matched = t != null && (always.nonEmpty ||
              auto.exists(t.asInstanceOf[UTF8String].toString))
            matched == wantMatch
          }
        case _ =>
          // SparkPlan contract: doExecute must emit UnsafeRows (a
          // collect directly on this node casts to UnsafeRow); a raw
          // JoinedRow would CCE, so project each joined row
          val proj = UnsafeProjection.create(output, output)
          val joiner = new JoinedRow()
          iter.flatMap { leftRow =>
            val t = textBound.eval(leftRow)
            if (t == null) Iterator.empty
            else {
              val text = t.asInstanceOf[UTF8String].toString
              // contains-semantics: one output row per matching build
              // row, regardless of how many times the surface occurs
              // (identity set, NOT identityHashCode ints — hash
              // collisions would silently drop rows)
              val seen = java.util.Collections.newSetFromMap(
                new java.util.IdentityHashMap[List[InternalRow], java.lang.Boolean]())
              val out = List.newBuilder[InternalRow]
              always.foreach(r => out += proj(joiner(leftRow, r)).copy())
              auto.scan(text) { (_, _, rows) =>
                if (seen.add(rows)) {
                  rows.foreach { r =>
                    out += proj(joiner(leftRow, r)).copy()
                  }
                }
              }
              out.result().iterator
            }
          }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AutomatonJoinExec =
    copy(left = newLeft, right = newRight)
}
