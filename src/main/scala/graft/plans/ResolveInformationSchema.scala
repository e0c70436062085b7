package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.InformationSchema

/** Analyzer rule resolving `information_schema.*` — the
  * [[graft.InformationSchema.Members]] set (the reference enables
  * DataFusion's information_schema,
  * /root/reference/crates/core/src/context.rs:27) onto the catalog-backed
  * views of [[graft.InformationSchema]].
  *
  * Injected through `GraftExtensions.injectResolutionRule`, so plain
  * `spark.sql("SELECT … FROM information_schema.tables")` works in ANY
  * session carrying `spark.sql.extensions=graft.GraftExtensions` — no
  * [[graft.AdtContext]] wrapper needed (the wrapper keeps a string-rewrite
  * fallback for sessions without the extension).
  *
  * The views refresh when — and only when — a plan actually references
  * information_schema, so the catalog walk (driver-side, one row per
  * table/column) never taxes ordinary queries.
  */
case class ResolveInformationSchema(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val referenced = plan.collect {
      case u: UnresolvedRelation if matches(u) =>
        u.multipartIdentifier.last.toLowerCase
    }.toSet
    if (referenced.isEmpty) plan
    else {
      // build only the members this plan references (a tables probe must
      // not pay the SET -v / listFunctions walks the other members need)
      InformationSchema.refresh(session, referenced)
      plan.resolveOperatorsUp {
        case u: UnresolvedRelation if matches(u) =>
          UnresolvedRelation(
            Seq("information_schema_" + u.multipartIdentifier.last.toLowerCase))
      }
    }
  }

  private def matches(u: UnresolvedRelation): Boolean = {
    val id = u.multipartIdentifier
    id.length == 2 && id.head.equalsIgnoreCase("information_schema") &&
      InformationSchema.Members.contains(id.last.toLowerCase)
  }
}
