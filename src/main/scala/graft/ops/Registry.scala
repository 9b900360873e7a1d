package graft.ops

/** All declared operator queries — the coverage surface the driver's
  * correctness gate and bench iterate over. */
object Registry {
  val specs: Seq[QuerySpec] =
    RelationalOps.specs ++ PipelineOps.specs ++ FunctionOps.specs ++
      TextOps.specs ++ VectorOps.specs ++ CurateOps.specs ++ LmOps.specs ++
      SearchOps.specs ++ PqOps.specs ++ SketchOps.specs ++
      ExtraOps.specs ++ OlapOps.specs ++ MatchOps.specs ++ WebOps.specs ++
      MultimodalOps.specs ++ ParseOps.specs ++ EnsembleOps.specs ++
      SourceSinkOps.specs ++ StreamOps.specs

  require(specs.map(_.name).distinct.size == specs.size,
    "duplicate query names in Registry")
}
