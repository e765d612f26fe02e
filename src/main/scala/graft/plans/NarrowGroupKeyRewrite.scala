package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Flag-gated GROUP-KEY NARROWING — the optimizer-rule form of the q2
  * `intkeys` lever (`ReferenceQueries.q2Grouped`).
  *
  * `GROUP BY concat(cast(a AS string), '-', cast(b AS string))` groups by
  * an INJECTIVE function of (a, b) when a and b are integral and the
  * separator is a single non-digit character, so the aggregate may group
  * by the raw values instead and synthesize the string once per group in
  * a Project above: the hash aggregate then hashes/compares fixed-width
  * integers instead of variable-length UTF8Strings, and the
  * pre-aggregation exchange partitions on (and carries) the narrow
  * integer key. At the ≥10⁶-group cardinality this shape targets
  * (measured via the build-time lever at q2g/sf0.1: 13.0 → 8.8 s before
  * the replication pushdown), the key width is a first-order cost.
  *
  * Injectivity proof sketch (why the guard admits what it admits):
  * decimal renderings of integral values are non-empty and contain '-'
  * only at position 0.
  *  - Separator '-': if x + "-" + y == x' + "-" + y' with x ≠ x' and,
  *    WLOG, |x| < |x'|, then x' contains a '-' at interior position
  *    |x| + 1 ≥ 1 — impossible for a rendering. So fields must agree.
  *  - Any other non-digit single-char separator c: c never occurs in a
  *    rendering at all, so the c-positions identify the separators
  *    uniquely and the split is unambiguous.
  * Either way concat is injective over the field tuple, the grouping
  * partition of input rows is IDENTICAL, and every aggregate function
  * computes over exactly the same groups — results are bit-equal by
  * construction (pinned by PlanRewriteSpec on live data anyway).
  *
  * Null correctness: `Concat` returns null when ANY child is null, so all
  * rows with ≥ 1 null field share ONE null-key group, while grouping by
  * the raw fields would keep (null, 1) apart from (null, 2). When any
  * field is nullable the rule therefore groups by NULLED fields —
  * `if(anyFieldNull, null, field_i)` — which collapses exactly those rows
  * into the all-null tuple and leaves every other tuple untouched; the
  * re-derived concat over the nulled fields reproduces the original null
  * key. Non-nullable fields skip the wrapper.
  *
  * Where the rule matches: the main optimizer has already run when
  * session-installed rules fire, and `PullOutGroupingExpressions` has
  * moved any complex grouping key into a Project below the Aggregate
  * (`Aggregate [_groupingexpression], [_groupingexpression AS k, aggs…],
  * Project [..., concat(...) AS _groupingexpression]`) — so THAT is the
  * shape this rule rewrites: narrow the Project to emit the raw fields,
  * group by them, and re-derive the string key in a Project above with
  * the original names and exprIds (parents never see the rewrite).
  *
  * Guards (all conservative — bail means "keep the declared plan"):
  * exactly one grouping attribute backed by a qualifying concat; children
  * strictly alternate field / separator with ≥ 2 fields; every field is
  * `cast(<deterministic integral expr> AS string)`; every separator is a
  * 1-char non-digit string literal; every other use of the key inside the
  * aggregate list bails (only top-level `alias(key)` / bare-attribute
  * slots are rewritten). Default OFF (`spark.graft.narrowGroupKey`): the
  * shipped q2 keys apply the narrowing at build time; the rule is the
  * engine-level form for SQL-text users, proven end-to-end by q2h.
  */
object NarrowGroupKeyRewrite extends Rule[LogicalPlan] {
  val Flag = "spark.graft.narrowGroupKey"

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** The injective-concat pattern: alternating field / separator children,
    * starting and ending with a field, ≥ 2 fields. Returns (field inner
    * expressions, separator literals) when the whole concat qualifies.
    */
  private def narrowable(e: Expression): Option[(Seq[Expression], Seq[Literal])] =
    e match {
      case Concat(children) if children.length >= 3 && children.length % 2 == 1 =>
        val fields = children.zipWithIndex.collect { case (c, i) if i % 2 == 0 => c }
        val seps = children.zipWithIndex.collect { case (c, i) if i % 2 == 1 => c }
        val inner = fields.map {
          case Cast(f, StringType, _, _)
            if integral(f.dataType) && f.deterministic => Some(f)
          case _ => None
        }
        val sepLits = seps.map {
          case l @ Literal(s, StringType) if s != null &&
            s.toString.length == 1 && !s.toString.charAt(0).isDigit => Some(l)
          case _ => None
        }
        if (inner.forall(_.isDefined) && sepLits.forall(_.isDefined))
          Some((inner.flatten, sepLits.flatten))
        else None
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(Flag, "false").toBoolean) return plan
    plan.transformDown {
      case a @ Aggregate(_, _, p: Project, _) => rewrite(a, p).getOrElse(a)
    }
  }

  private def rewrite(a: Aggregate, p: Project): Option[LogicalPlan] = {
    // exactly one grouping attribute whose defining Project alias is a
    // qualifying concat — the q2 shape. (Several would compose; no
    // declared query needs it — keep the rule minimal.)
    val candidates = a.groupingExpressions.zipWithIndex.flatMap {
      case (g: AttributeReference, i) =>
        p.projectList.collectFirst {
          case al @ Alias(c, _) if al.exprId == g.exprId => (i, g, al, c)
        }.flatMap { case (gi, gAttr, gAlias, c) =>
          narrowable(c).map { case (fields, seps) =>
            (gi, gAttr, gAlias, fields, seps)
          }
        }
      case _ => None
    }
    if (candidates.length != 1) return None
    val (gi, gAttr, gAlias, fields, seps) = candidates.head

    // only top-level slots may carry the key in the aggregate list
    val slots = a.aggregateExpressions.zipWithIndex.collect {
      case (al @ Alias(ar: AttributeReference, _), i)
        if ar.exprId == gAttr.exprId => (i, al.name, al.exprId, al.metadata)
      case (ar: AttributeReference, i) if ar.exprId == gAttr.exprId =>
        (i, ar.name, ar.exprId, ar.metadata)
    }
    val nestedUse = a.aggregateExpressions.zipWithIndex.exists {
      case (ne, i) => !slots.exists(_._1 == i) && ne.exists {
        case ar: AttributeReference => ar.exprId == gAttr.exprId
        case _ => false
      }
    }
    if (slots.isEmpty || nestedUse) return None

    // nulled fields: any-null row tuples collapse to (null,…,null),
    // reproducing Concat's single null-key group exactly
    val nullables = fields.filter(_.nullable)
    val wrapped =
      if (nullables.isEmpty) fields
      else {
        val anyNull = nullables.map(IsNull(_): Expression).reduce(Or)
        fields.map(f =>
          If(anyNull, Literal.create(null, f.dataType), f): Expression)
      }
    val fieldAliases = wrapped.zipWithIndex.map { case (f, i) =>
      Alias(f, s"_graft_narrowkey_$i")()
    }
    val fieldAttrs = fieldAliases.map(_.toAttribute)

    val newProject = Project(
      p.projectList.filterNot {
        case al: Alias => al.exprId == gAlias.exprId
        case _ => false
      } ++ fieldAliases, p.child)
    val newGrouping = a.groupingExpressions.take(gi) ++ fieldAttrs ++
      a.groupingExpressions.drop(gi + 1)
    val newAggList: Seq[NamedExpression] = a.aggregateExpressions.zipWithIndex
      .flatMap {
        case (_, i) if slots.exists(_._1 == i) =>
          if (i == slots.head._1) fieldAttrs else Nil
        case (ne, _) => Seq(ne)
      }
    val narrowed = a.copy(groupingExpressions = newGrouping,
      aggregateExpressions = newAggList, child = newProject)

    // re-derive the string key above, with the original separators and
    // the original output names/exprIds
    val rebuilt = Concat(fieldAttrs.zip(seps).flatMap { case (f, sep) =>
      Seq(Cast(f, StringType), sep)
    } :+ Cast(fieldAttrs.last, StringType))
    val projectList: Seq[NamedExpression] = a.aggregateExpressions.zipWithIndex
      .map { case (ne, i) =>
        slots.find(_._1 == i) match {
          case Some((_, name, id, md)) =>
            Alias(rebuilt, name)(exprId = id, explicitMetadata = Some(md))
          case None => ne.toAttribute
        }
      }
    Some(Project(projectList, narrowed))
  }
}
