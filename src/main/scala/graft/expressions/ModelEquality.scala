package graft.expressions

/** Content equality for the model arrays riding the reference-object
  * expressions ([[CountMinProbe]], [[IvfCellProbe]], [[PqAdcLuts]],
  * [[LshBucketTables]]).
  *
  * Why it exists: these are case classes with `Array` fields, and JVM
  * array equality is referential — the synthesized `equals`/`hashCode`
  * never match two semantically identical instances built from the same
  * model bytes. That silently defeats every Catalyst facility keyed on
  * expression equality: common-subexpression elimination, canonicalized
  * plan comparison, and exchange reuse when the same sketch/model is
  * probed in two places of one plan. Each expression overrides
  * `equals`/`hashCode` through these helpers so equality follows the
  * model CONTENT (the semantics) instead of the allocation.
  */
private[expressions] object ModelEquality {
  def deepEq(a: Array[Array[Long]], b: Array[Array[Long]]): Boolean =
    java.util.Arrays.deepEquals(
      a.asInstanceOf[Array[AnyRef]], b.asInstanceOf[Array[AnyRef]])

  def deepHash(a: Array[Array[Long]]): Int =
    java.util.Arrays.deepHashCode(a.asInstanceOf[Array[AnyRef]])
}
