package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M10 — surgical rewrite of a reference field inside every element of
  * an `array<struct>` column.
  *
  * The reference walks every entry of an already-built FHIR bundle and
  * rewires each resource's subject/encounter references to the bundle's
  * canonical ids, skipping the whole message when a reference can't be
  * resolved (/root/reference/src/main/java/de/unimarburg/diz/labtofhir/mapper/AimLabMapper.java:323-363,
  * BaseMapper.java:267-296 — `validateReference` throws → message
  * skipped). The Spark-native re-expression is a pure columnar
  * `transform` + `withField` over the nested array — no explode/
  * regroup round-trip (which would shuffle on the group key), no UDF:
  * the rewrite stays inside whole-stage codegen and the array never
  * leaves its row.
  */
object StructRewrite {

  /** Rewrite `arrCol[i].refField` for every element via `newRef`
    * (given the old value), splitting off rows where ANY element's ref
    * is null — those are quarantined wholesale, the analogue of the
    * reference throwing on the first unresolvable reference and
    * skipping the entire bundle.
    *
    * @return (rewritten rows, quarantined rows — original shape)
    */
  def rewriteRefs(df: DataFrame, arrCol: String, refField: String,
      newRef: Column => Column): (DataFrame, DataFrame) = {
    // a NULL array column is as unresolvable as a null ref inside it —
    // without the isNull arm both filters would evaluate to NULL and
    // the row would vanish from BOTH outputs (rewritten ∪ quarantined
    // must equal the input)
    val anyMissing =
      col(arrCol).isNull || exists(col(arrCol), e => e.getField(refField).isNull)
    val rewritten = df
      .filter(!anyMissing)
      .withColumn(arrCol, transform(col(arrCol),
        e => e.withField(refField, newRef(e.getField(refField)))))
    val quarantined = df.filter(anyMissing)
    (rewritten, quarantined)
  }
}
