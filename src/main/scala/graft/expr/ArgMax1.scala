package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, CreateNamedStruct, EqualTo, Expression, GreaterThan, If, IsNull, LessThan, Literal, Not, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Argmax aggregate CARRYING its score: per group, the (ord, id) of the
  * best row under (ord DESC, id ASC) — `row_number() OVER (ORDER BY ord
  * DESC, id ASC) = 1` returning both columns, WITHOUT the window.
  *
  * Why this exists (round 10): the IMI descent's two-region probe needs
  * the per-(vector, level-2 cell) fine winner WITH its cosine, so the
  * cross-cell top-2 can rank the two cells' winners against each other
  * ([[graft.queries.VectorOps]] `imiAssignments`). [[ArgTop2]] collapses
  * the candidate relation but outputs only ids; the obvious
  * `max(struct(cs, -cid))` spelling keeps the score but its STRUCT
  * aggregation buffer demotes the whole aggregation to SortAggregateExec
  * — re-sorting the O(n·k^(1/3)) fine-candidate relation, exactly the
  * 0.4 TB-at-10⁷ sorter tax ArgTop2 exists to remove (caught by the
  * PlanShapeSpec sort-free gate, not in review). Two primitive buffer
  * slots keep HashAggregateExec's UnsafeRow fast path; the struct is
  * created only in the once-per-group eval.
  *
  * Determinism: ids are unique per group, so (ord DESC, id ASC) is a
  * total order and the winner is unique regardless of row arrival or
  * partial-merge order — the oracle's row_number twin replays exactly.
  */
case class ArgMax1(ord: Expression, id: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(ord, id)
  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("cs", DoubleType, nullable = true),
    StructField("cid", LongType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vec_arg_max1 requires (double ord, bigint id) arguments")

  override def prettyName: String = "vec_arg_max1"

  private lazy val c1 = AttributeReference("c1", DoubleType)()
  private lazy val i1 = AttributeReference("i1", LongType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(c1, i1)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, DoubleType), Literal.create(null, LongType))

  /** (co, io) ranks strictly before (cb, ib): higher ord, ties to lower id. */
  private def better(co: Expression, io: Expression,
      cb: Expression, ib: Expression): Expression =
    Or(GreaterThan(co, cb), And(EqualTo(co, cb), LessThan(io, ib)))

  override lazy val updateExpressions: Seq[Expression] = {
    val beat = And(Not(IsNull(ord)), Or(IsNull(c1), better(ord, id, c1, i1)))
    Seq(
      If(beat, ord, c1),
      If(beat, id, i1))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val takeRight = And(Not(IsNull(c1.right)),
      Or(IsNull(c1.left), better(c1.right, i1.right, c1.left, i1.left)))
    Seq(
      If(takeRight, c1.right, c1.left),
      If(takeRight, i1.right, i1.left))
  }

  override lazy val evaluateExpression: Expression =
    If(IsNull(c1), Literal.create(null, dataType),
      CreateNamedStruct(Seq(Literal("cs"), c1, Literal("cid"), i1)))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArgMax1 =
    copy(ord = newChildren(0), id = newChildren(1))
}
