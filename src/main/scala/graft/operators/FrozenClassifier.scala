package graft.operators

/** Frozen quality-classifier weights (round 12): the q99 fastText-style
  * filter model (dim=2048 hashing-trick binary presence features,
  * 60 rounds of full-batch logistic GD, lr=2.0, label = planted token
  * 'spark') trained once per fixture and committed as QUANTIZED Long
  * literals (`round(w * 10^12)`), the way a production pipeline ships
  * its data-quality classifier checkpoint. Freezing + quantization is
  * what makes q99 DuckDB-oracle-expressible: the scoring margin becomes
  * an exact BIGINT sum both engines replay bit-for-bit, with `exp` the
  * only remaining libm call (round-6 + an audited boundary margin
  * absorb its ulps). Training stays first-class: q99 retrains live and
  * require-fails if the result drifts more than [[FrozenClassifier.DriftTolerance]]
  * from this artifact, and `FrozenClassifierSpec` pins the same gate in
  * `sbt test`. Only nonzero entries are stored (the fixture vocabulary
  * touches ~31 of 2048 hashed dims); bias is kept separately.
  *
  * Provenance: `graft.FreezeClassifierWeights` (regenerate with
  * `sbt "runMain graft.FreezeClassifierWeights <fixture dirs...>"`).
  */
object FrozenClassifier {

  val Dim = 2048

  val Scale = 1000000000000L

  /** Max |round(w_live*Scale) - frozen| q99 tolerates: 1e-8 in
    * weight units -- orders of magnitude above float treeAggregate
    * reduce-order ulps, orders below any real recipe drift.
    */
  val DriftTolerance = 10000L

  private val weights_sf0_01: Vector[(Int, Long)] = Vector(
    (37, 106197358719L), (59, -120565445010L), (133, 20540818051L), (158, -26257029295L),
    (250, -351254522589L), (417, 200889178795L), (466, 214295660137L), (510, -68051537942L),
    (744, -567831358L), (817, -109077490153L), (850, 133465410931L), (854, -45671027945L),
    (860, 36458008166L), (959, 114660097230L), (986, -183884384101L), (1029, 102128626550L),
    (1042, -179599470808L), (1223, 441082685301L), (1237, -230862751173L), (1259, 266146327163L),
    (1300, -268943128525L), (1302, -9185555239L), (1376, -269308201477L), (1574, 6582727187485L),
    (1685, 95977987844L), (1702, 348822558587L), (1729, -399972471001L), (1800, -109354538616L),
    (1845, -234739206281L), (1973, -194009373035L), (2035, -209367657557L))

  private val bias_sf0_01: Long = -1905132751027L

  private val weights_sf0_1: Vector[(Int, Long)] = Vector(
    (37, -124089888458L), (59, 8698427193L), (133, -95693296690L), (158, 12149746004L),
    (250, -38560972335L), (417, -34278412155L), (466, 40230793869L), (510, -3132118403L),
    (744, -61331766853L), (817, -22929265961L), (850, -187983627716L), (854, 88135166559L),
    (860, -11769820141L), (959, -13965600763L), (986, -144904782085L), (1029, -88979819581L),
    (1042, 137702290825L), (1223, 33766097189L), (1237, -12447717099L), (1259, -56016840777L),
    (1300, 47445283315L), (1302, -71801894220L), (1376, 45272820387L), (1574, 6470365258944L),
    (1685, 61048451333L), (1702, -29174510118L), (1729, 23710205502L), (1800, -37042194433L),
    (1845, -70945644952L), (1973, -65604610397L), (2035, -2227640423L))

  private val bias_sf0_1: Long = -1951568832978L

  val weightsBySf: Map[String, Vector[(Int, Long)]] = Map(
    "sf0.01" -> weights_sf0_01,
    "sf0.1" -> weights_sf0_1)

  val biasBySf: Map[String, Long] = Map(
    "sf0.01" -> bias_sf0_01,
    "sf0.1" -> bias_sf0_1)

  private def key(dir: String): String = new java.io.File(dir).getName

  /** Dense dim+1 quantized weights (bias last, the Classifier.margin
    * layout) for a fixture dir; None -> caller scores live (scale
    * probes / unknown corpora).
    */
  def weightsQFor(dir: String): Option[Array[Long]] =
    weightsBySf.get(key(dir)).map { sparse =>
      val w = new Array[Long](Dim + 1)
      sparse.foreach { case (i, q) => w(i) = q }
      w(Dim) = biasBySf(key(dir))
      w
    }

  /** The sf0.01 artifact, interpolated into the DuckDB oracle SQL
    * (`ClassifierSql`) -- the fixture the driver's correctness gate
    * runs on.
    */
  def oracleWeights: Vector[(Int, Long)] = weightsBySf("sf0.01")

  def oracleBias: Long = biasBySf("sf0.01")
}
