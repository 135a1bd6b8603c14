package graft.queries

/** All declared queries, keyed by name. Each family object contributes a Seq[Q];
  * `SparkEntry` exposes the union to the driver's Verify/Bench harness. */
object Registry {
  def families: Seq[Seq[Q]] = Seq(
    ScanFilter.qs,
    Aggregates.qs,
    WindowQs.qs,
    SetOps.qs,
    Joins.qs,
    Explodes.qs,
    Scalars.qs,
    FlagQs.qs,
    IdentityQs.qs,
    DedupQs.qs,
    SimilarityQs.qs,
    TextQs.qs,
    PrivacyQs.qs,
    MultimodalQs.qs,
    StreamQs.qs,
    Dashboard.qs,
    CustomerMaster.qs,
    ConversionFunnel.qs,
    FamilyEdges.qs,
    Experiments.qs,
    DataQuestions.qs,
    MlQs.qs,
    Reports.qs,
    EventsTable.qs)

  lazy val all: Seq[Q] = {
    val qs = families.flatten
    val dup = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }
}
