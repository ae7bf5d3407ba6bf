package graft.model

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

class ModelSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("typed claim items round-trip through the Dataset API") {
    val ds = Model.claimItems(spark, "/root/testdata/sf0.001")
    val items = ds.collect()
    assert(items.length == 100)
    assert(items.forall(i => i.visit_service_id == i.visit_id * 10 + i.seq_no))
    val returned = ds.filter(_.status == "R").count()
    assert(returned > 0, "typed filter compiles and runs on the extraction")
  }

  test("schemaOf derives the schema from the case class") {
    val s = Model.schemaOf[Model.EligibilityResult]
    assert(s.fieldNames.toSeq == Seq("visit_id", "outcome", "note", "eligibility_class",
      "approval_limit", "copay_maximum", "insertion_date"))
    assert(s("approval_limit").nullable, "Option fields derive nullable columns")
    assert(!s("visit_id").nullable, "primitive fields derive non-nullable columns")
  }
}
