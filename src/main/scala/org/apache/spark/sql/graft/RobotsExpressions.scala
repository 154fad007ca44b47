package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt (REP, RFC 9309) expressions — the site-level crawl opt-out.
  * [[graft.core.RobotsTxt]] is the kernel and states the implemented
  * subset; these are thin codegen'd adapters.
  *
  * `robots_rules(body, agent)` parses one robots.txt body and returns
  * the rule list selected for `agent` as `array<string>`, each entry
  * flag-prefixed (`"A" + pattern` for Allow, `"D" + pattern` for
  * Disallow) — a flat encoding that crosses the expression boundary
  * without struct plumbing and cannot be ambiguous (the flag is a fixed
  * first octet we add). `agent` is a construction-time constant: the
  * pipeline crawls as ONE agent, so per-row agents would only hide a
  * config error. NULL body → NULL. */
case class RobotsRules(child: Expression, agent: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(agent != null && agent.nonEmpty, "agent must be non-empty")

  override def prettyName: String = "robots_rules"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    RobotsRules.rules(v.asInstanceOf[UTF8String], agent)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = s"${classOf[RobotsRules].getName}$$.MODULE$$"
    val a = ctx.addReferenceObj("robotsAgent", agent, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $mod.rules($c, $a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RobotsRules {
  /** Static call target for interpreted eval and generated code. */
  def rules(body: UTF8String, agent: String): ArrayData =
    new GenericArrayData(
      graft.core.RobotsTxt.parse(body.toString, agent).map { case (allow, pat) =>
        UTF8String.fromString((if (allow) "A" else "D") + pat)
      }.toArray[Any])
}

/** `robots_disallowed(target, rules)`: the REP verdict for one
  * path-and-query target against a flag-prefixed rule list (the
  * [[RobotsRules]] encoding) — longest matching raw pattern wins, Allow
  * wins ties, no match (or an empty list) means allowed. NULL in either
  * input → NULL; callers treat a missing robots.txt as allowed by
  * coalescing. */
case class RobotsDisallowed(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "robots_disallowed"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, ArrayType(StringType))
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(t: Any, r: Any): Any =
    RobotsDisallowed.disallowed(t.asInstanceOf[UTF8String],
      r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = s"${classOf[RobotsDisallowed].getName}$$.MODULE$$"
    nullSafeCodeGen(ctx, ev, (t, r) => s"${ev.value} = $mod.disallowed($t, $r);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

object RobotsDisallowed {
  /** Static call target for interpreted eval and generated code.
    * Decodes the flag-prefixed entries (validating the encoding loudly
    * — the public `robots_disallowed` accepts any array<string>, and a
    * null/empty/unflagged element composed from somewhere other than
    * `robots_rules` must name the broken contract, not NPE deep in
    * codegen) and delegates the verdict to the ONE owner,
    * [[graft.core.RobotsTxt.disallowed]]. */
  def disallowed(target: UTF8String, rules: ArrayData): Boolean = {
    val t = target.toString
    val n = rules.numElements()
    val decoded = new Array[(Boolean, String)](n)
    var i = 0
    while (i < n) {
      val u = if (rules.isNullAt(i)) null else rules.getUTF8String(i)
      val e = if (u == null) null else u.toString
      if (e == null || e.isEmpty || (e.charAt(0) != 'A' && e.charAt(0) != 'D'))
        throw new IllegalArgumentException(
          s"robots_disallowed: rule element ${if (e == null) "NULL" else s"'$e'"} " +
            "is not flag-prefixed ('A'/'D' + pattern) — pass robots_rules() " +
            "output, the encoding this verdict is defined over")
      decoded(i) = (e.charAt(0) == 'A', e.substring(1))
      i += 1
    }
    graft.core.RobotsTxt.disallowed(t, decoded)
  }
}
