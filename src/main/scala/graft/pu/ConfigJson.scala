package graft.pu

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** JSON (de)serialization of learner configs with SHORT TYPE HINTS — the
  * reference's configs are its serializable "query text", round-tripped
  * through json4s `ShortTypeHints(subclasses)`
  * (reference: PositiveUnlabeledLearner.scala:28-40). Same wire shape here:
  * a `jsonClass` field carrying the simple class name, dispatch driven by
  * the `subclasses` registries (an unregistered hint is an error, exactly
  * like json4s). Jackson-databind ships with Spark, so no new dependency;
  * the flat case classes are written/read explicitly — no reflection, no
  * scala-module version coupling.
  */
object ConfigJson {
  private val mapper = new ObjectMapper()

  private def hintName(c: Class[_]): String = c.getSimpleName

  private def writeClassifier(node: ObjectNode, c: ProbabilisticClassifierConfig): Unit =
    c match {
      case LogisticRegressionConfig(maxIter, regParam, elasticNetParam) =>
        node.put("jsonClass", hintName(c.getClass))
        node.put("maxIter", maxIter)
        node.put("regParam", regParam)
        node.put("elasticNetParam", elasticNetParam)
      case RandomForestConfig(numTrees, seed) =>
        node.put("jsonClass", hintName(c.getClass))
        node.put("numTrees", numTrees)
        node.put("seed", seed)
    }

  def write(config: PositiveUnlabeledLearnerConfig): String = {
    val node = mapper.createObjectNode()
    node.put("jsonClass", hintName(config.getClass))
    config match {
      case TraditionalPULearnerConfig(th, iters, cc) =>
        node.put("relNegThreshold", th)
        node.put("maxIters", iters)
        writeClassifier(node.putObject("classifierConfig"), cc)
      case GradualReductionPULearnerConfig(th, cc) =>
        node.put("relNegThreshold", th)
        writeClassifier(node.putObject("classifierConfig"), cc)
    }
    mapper.writeValueAsString(node)
  }

  private def requireRegistered(hint: String, registry: List[Class[_]]): Unit =
    require(registry.exists(hintName(_) == hint),
      s"unregistered jsonClass hint '$hint' (registry: ${registry.map(hintName).mkString(", ")})")

  private def readClassifier(n: com.fasterxml.jackson.databind.JsonNode): ProbabilisticClassifierConfig = {
    val hint = n.get("jsonClass").asText()
    requireRegistered(hint, ProbabilisticClassifierConfig.subclasses)
    hint match {
      case "LogisticRegressionConfig" =>
        LogisticRegressionConfig(n.get("maxIter").asInt(),
          n.get("regParam").asDouble(), n.get("elasticNetParam").asDouble())
      case "RandomForestConfig" =>
        RandomForestConfig(n.get("numTrees").asInt(), n.get("seed").asLong())
    }
  }

  def read(json: String): PositiveUnlabeledLearnerConfig = {
    val n = mapper.readTree(json)
    val hint = n.get("jsonClass").asText()
    requireRegistered(hint, PositiveUnlabeledLearnerConfig.subclasses)
    hint match {
      case "TraditionalPULearnerConfig" =>
        TraditionalPULearnerConfig(n.get("relNegThreshold").asDouble(),
          n.get("maxIters").asInt(), readClassifier(n.get("classifierConfig")))
      case "GradualReductionPULearnerConfig" =>
        GradualReductionPULearnerConfig(n.get("relNegThreshold").asDouble(),
          readClassifier(n.get("classifierConfig")))
    }
  }
}
