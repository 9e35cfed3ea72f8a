package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Trained language identification: a multinomial Naive Bayes model over
  * hashed character 1–3-grams — the fastText-lid shape (Joulin et al.
  * 2016: char-n-gram features, linear classifier) reduced to its
  * count-based core, replacing the function-word-marker heuristic
  * ([[TextAnalysis.langId]], kept as the cheap pure-`Column` pre-filter)
  * as the engine's production lang-ID path (VERDICT r12 #3).
  *
  * Freezing discipline, strengthened: the model is trained AT OBJECT
  * INIT from the committed [[SeedCorpus]] with exact integer counting —
  * the only float op is one `StrictMath.log` per (bucket, lang) at
  * init, immediately quantized to `round(log * 1e6)` Longs. Training
  * drift is impossible by construction (same committed corpus, same
  * exact counts, platform-independent StrictMath), which is strictly
  * stronger than a frozen-checkpoint-plus-tolerance gate; a handful of
  * weights are additionally golden-pinned in `LangIdSpec` so any future
  * recipe change fails loudly. Scoring is pure BIGINT arithmetic
  * (`prior + n_grams·floor + Σ delta(bucket)`), so the DuckDB oracle
  * ([[graft.queries.LangIdSql]]) replays it bit-for-bit from the same
  * in-memory quantized weights — no libm in either engine's scoring
  * path.
  *
  * Scale shape: scoring is map-only with the ~[[Dim]]·5-Long model in
  * executor code (a few KB of class constants — smaller than a
  * broadcast); at 100 TB it is a projected parquet scan with no
  * shuffle. [[graft.functions.LangIdExpression]] exposes the same
  * kernel as a native codegen expression so [[TextAnalysis.analyze]]
  * keeps its single WholeStageCodegen projection.
  *
  * Unicode boundary: characters are UTF-16 code units in Scala and code
  * points in the DuckDB twin — identical for BMP text (all of the seed
  * corpus and every fixture); supplementary-plane input would diverge
  * and is out of the parity contract (documented, not silently wrong:
  * grams are still deterministic in each engine). Case folding is
  * deliberately ASCII-only and whitespace collapse explicitly includes
  * U+000B on both sides — see [[normalize]] — so locale/regex-dialect
  * divergences cannot reach the gram stream.
  */
object LangId {

  /** Hashed feature space: buckets = polynomial-31 hash of the gram's
    * chars mod Dim — the hashing trick with an engine-portable hash
    * (exact BIGINT arithmetic in DuckDB; max pre-mod value for a
    * 3-gram of BMP chars is < 2^26·31^2, nowhere near overflow).
    */
  val Dim = 1024
  val GramB = 31L
  val MaxN = 3

  /** Log-prob quantization scale (round(log·1e6) — the q99/q76 exact-
    * BIGINT-margin discipline).
    */
  val Scale = 1000000L

  /** Languages in tie-break order (first max wins). The set matches the
    * fixture corpus; a production deployment extends [[Langs]] and
    * [[SeedCorpus]] together (per-language floors/priors are computed
    * independently, so existing weights — and their golden pins — are
    * unaffected by added languages).
    */
  val Langs: Vector[String] = Vector("en", "es", "de", "fr", "zh")

  val Unknown = "und"

  /** Committed training corpus: everyday sentences authored for this
    * seed (24 per language). The model is a pure deterministic function
    * of this data — the corpus IS the checkpoint.
    */
  val SeedCorpus: Seq[(String, String)] = Seq(
    "en" -> "the weather is very nice today and we should go outside",
    "en" -> "she bought three books from the shop on the corner",
    "en" -> "i think this is the best answer to your question",
    "en" -> "the children are playing in the garden behind the house",
    "en" -> "we will travel to the mountains next summer with friends",
    "en" -> "he works at the hospital and comes home late every night",
    "en" -> "please close the window because it is getting cold",
    "en" -> "the train leaves at seven and arrives around noon",
    "en" -> "my brother lives in a small town near the coast",
    "en" -> "they have been waiting for the bus for twenty minutes",
    "en" -> "could you tell me where the nearest station is",
    "en" -> "the meeting was long but we reached a good decision",
    "en" -> "there is a lot of water in the river after the rain",
    "en" -> "she speaks softly but everyone listens when she talks",
    "en" -> "the old bridge was built more than a hundred years ago",
    "en" -> "we usually have dinner together on sunday evenings",
    "en" -> "the students finished their homework before the class",
    "en" -> "a cup of coffee in the morning helps me wake up",
    "en" -> "the museum is open every day except on mondays",
    "en" -> "his answer surprised everyone in the room yesterday",
    "en" -> "the company opened a new office in the city center",
    "en" -> "it takes about an hour to walk from here to the lake",
    "en" -> "they planted trees along the road last spring",
    "en" -> "the light in the kitchen has been broken for a week",
    "es" -> "el tiempo está muy agradable hoy y deberíamos salir fuera",
    "es" -> "ella compró tres libros en la tienda de la esquina",
    "es" -> "creo que esta es la mejor respuesta a tu pregunta",
    "es" -> "los niños están jugando en el jardín detrás de la casa",
    "es" -> "viajaremos a las montañas el próximo verano con amigos",
    "es" -> "él trabaja en el hospital y vuelve tarde cada noche",
    "es" -> "por favor cierra la ventana porque hace frío",
    "es" -> "el tren sale a las siete y llega cerca del mediodía",
    "es" -> "mi hermano vive en un pueblo pequeño cerca de la costa",
    "es" -> "llevan veinte minutos esperando el autobús en la plaza",
    "es" -> "puede decirme dónde está la estación más cercana",
    "es" -> "la reunión fue larga pero llegamos a una buena decisión",
    "es" -> "hay mucha agua en el río después de la lluvia",
    "es" -> "habla bajito pero todos escuchan cuando ella dice algo",
    "es" -> "el puente viejo fue construido hace más de cien años",
    "es" -> "solemos cenar juntos los domingos por la noche",
    "es" -> "los estudiantes terminaron sus deberes antes de la clase",
    "es" -> "una taza de café por la mañana me ayuda a despertar",
    "es" -> "el museo abre todos los días excepto los lunes",
    "es" -> "su respuesta sorprendió a todos en la sala ayer",
    "es" -> "la empresa abrió una oficina nueva en el centro de la ciudad",
    "es" -> "se tarda una hora en caminar desde aquí hasta el lago",
    "es" -> "plantaron árboles a lo largo del camino la primavera pasada",
    "es" -> "la luz de la cocina lleva una semana rota",
    "de" -> "das wetter ist heute sehr schön und wir sollten nach draußen gehen",
    "de" -> "sie kaufte drei bücher in dem laden an der ecke",
    "de" -> "ich denke das ist die beste antwort auf deine frage",
    "de" -> "die kinder spielen im garten hinter dem haus",
    "de" -> "wir werden nächsten sommer mit freunden in die berge fahren",
    "de" -> "er arbeitet im krankenhaus und kommt jeden abend spät nach hause",
    "de" -> "bitte schließe das fenster weil es kalt wird",
    "de" -> "der zug fährt um sieben ab und kommt gegen mittag an",
    "de" -> "mein bruder wohnt in einer kleinen stadt nahe der küste",
    "de" -> "sie warten seit zwanzig minuten auf den bus am platz",
    "de" -> "können sie mir sagen wo der nächste bahnhof ist",
    "de" -> "die besprechung war lang aber wir trafen eine gute entscheidung",
    "de" -> "nach dem regen ist viel wasser im fluss",
    "de" -> "sie spricht leise aber alle hören zu wenn sie redet",
    "de" -> "die alte brücke wurde vor über hundert jahren gebaut",
    "de" -> "wir essen sonntags abends meistens zusammen",
    "de" -> "die schüler beendeten ihre hausaufgaben vor dem unterricht",
    "de" -> "eine tasse kaffee am morgen hilft mir beim aufwachen",
    "de" -> "das museum ist jeden tag außer montags geöffnet",
    "de" -> "seine antwort überraschte gestern alle im raum",
    "de" -> "die firma eröffnete ein neues büro in der stadtmitte",
    "de" -> "man braucht etwa eine stunde zu fuß von hier zum see",
    "de" -> "sie pflanzten letzten frühling bäume entlang der straße",
    "de" -> "das licht in der küche ist seit einer woche kaputt",
    "fr" -> "le temps est très agréable aujourd'hui et nous devrions sortir",
    "fr" -> "elle a acheté trois livres dans la boutique au coin de la rue",
    "fr" -> "je pense que c'est la meilleure réponse à ta question",
    "fr" -> "les enfants jouent dans le jardin derrière la maison",
    "fr" -> "nous irons à la montagne l'été prochain avec des amis",
    "fr" -> "il travaille à l'hôpital et rentre tard chaque soir",
    "fr" -> "ferme la fenêtre s'il te plaît parce qu'il fait froid",
    "fr" -> "le train part à sept heures et arrive vers midi",
    "fr" -> "mon frère habite dans une petite ville près de la côte",
    "fr" -> "ils attendent le bus depuis vingt minutes sur la place",
    "fr" -> "pouvez-vous me dire où se trouve la gare la plus proche",
    "fr" -> "la réunion était longue mais nous avons pris une bonne décision",
    "fr" -> "il y a beaucoup d'eau dans la rivière après la pluie",
    "fr" -> "elle parle doucement mais tout le monde écoute quand elle parle",
    "fr" -> "le vieux pont a été construit il y a plus de cent ans",
    "fr" -> "nous dînons généralement ensemble le dimanche soir",
    "fr" -> "les étudiants ont fini leurs devoirs avant le cours",
    "fr" -> "une tasse de café le matin m'aide à me réveiller",
    "fr" -> "le musée est ouvert tous les jours sauf le lundi",
    "fr" -> "sa réponse a surpris tout le monde dans la salle hier",
    "fr" -> "l'entreprise a ouvert un nouveau bureau au centre-ville",
    "fr" -> "il faut environ une heure pour marcher d'ici au lac",
    "fr" -> "ils ont planté des arbres le long de la route au printemps",
    "fr" -> "la lumière de la cuisine est cassée depuis une semaine",
    "zh" -> "今天天气很好我们应该出去走走",
    "zh" -> "她在街角的商店买了三本书",
    "zh" -> "我认为这是你问题的最好答案",
    "zh" -> "孩子们在房子后面的花园里玩耍",
    "zh" -> "明年夏天我们要和朋友一起去山里旅行",
    "zh" -> "他在医院工作每天晚上很晚回家",
    "zh" -> "请把窗户关上因为天气变冷了",
    "zh" -> "火车七点出发中午左右到达",
    "zh" -> "我哥哥住在海边附近的一个小镇",
    "zh" -> "他们在广场上等公共汽车等了二十分钟",
    "zh" -> "请问最近的车站在哪里",
    "zh" -> "会议很长但是我们做出了一个好决定",
    "zh" -> "雨后河里的水很多",
    "zh" -> "她说话很轻但大家都认真听",
    "zh" -> "这座老桥建于一百多年前",
    "zh" -> "我们通常星期天晚上一起吃饭",
    "zh" -> "学生们在上课前完成了作业",
    "zh" -> "早上一杯咖啡帮助我醒来",
    "zh" -> "博物馆除了星期一每天都开放",
    "zh" -> "他的回答昨天让屋里所有人都很吃惊",
    "zh" -> "公司在市中心开了一个新办公室",
    "zh" -> "从这里走到湖边大约需要一个小时",
    "zh" -> "他们去年春天沿着道路种了树",
    "zh" -> "厨房的灯已经坏了一个星期")

  /** Committed held-out sentences (8 per language) — the accuracy gate
    * `LangIdSpec` runs; never seen by training.
    */
  val HeldOut: Seq[(String, String)] = Seq(
    "en" -> "the doctor asked me to come back next week for the results",
    "en" -> "we watched the sunset from the top of the hill",
    "en" -> "this restaurant serves the best soup in the whole city",
    "en" -> "my keys were in my coat pocket the entire time",
    "en" -> "the library closes early on friday afternoons",
    "en" -> "a strong wind blew the leaves across the yard",
    "en" -> "she learned to play the piano when she was six",
    "en" -> "the map shows two roads leading to the village",
    "es" -> "el médico me pidió volver la próxima semana para los resultados",
    "es" -> "vimos la puesta de sol desde lo alto de la colina",
    "es" -> "este restaurante sirve la mejor sopa de toda la ciudad",
    "es" -> "mis llaves estuvieron todo el tiempo en el bolsillo del abrigo",
    "es" -> "la biblioteca cierra temprano los viernes por la tarde",
    "es" -> "un viento fuerte arrastró las hojas por el patio",
    "es" -> "aprendió a tocar el piano cuando tenía seis años",
    "es" -> "el mapa muestra dos caminos que llevan al pueblo",
    "de" -> "der arzt bat mich nächste woche wegen der ergebnisse wiederzukommen",
    "de" -> "wir sahen den sonnenuntergang vom gipfel des hügels",
    "de" -> "dieses restaurant hat die beste suppe der ganzen stadt",
    "de" -> "meine schlüssel waren die ganze zeit in meiner manteltasche",
    "de" -> "die bibliothek schließt freitags nachmittags früh",
    "de" -> "ein starker wind wehte die blätter über den hof",
    "de" -> "sie lernte klavier spielen als sie sechs war",
    "de" -> "die karte zeigt zwei wege die zum dorf führen",
    "fr" -> "le médecin m'a demandé de revenir la semaine prochaine pour les résultats",
    "fr" -> "nous avons regardé le coucher du soleil depuis le sommet de la colline",
    "fr" -> "ce restaurant sert la meilleure soupe de toute la ville",
    "fr" -> "mes clés étaient dans la poche de mon manteau tout ce temps",
    "fr" -> "la bibliothèque ferme tôt le vendredi après-midi",
    "fr" -> "un vent fort a poussé les feuilles à travers la cour",
    "fr" -> "elle a appris à jouer du piano quand elle avait six ans",
    "fr" -> "la carte montre deux routes qui mènent au village",
    "zh" -> "医生让我下星期再来看结果",
    "zh" -> "我们从山顶上看了日落",
    "zh" -> "这家餐馆的汤是全城最好的",
    "zh" -> "我的钥匙一直在大衣口袋里",
    "zh" -> "图书馆星期五下午关门很早",
    "zh" -> "一阵大风把树叶吹过了院子",
    "zh" -> "她六岁的时候学会了弹钢琴",
    "zh" -> "地图上显示两条通往村子的路")

  /** Shared normalization: collapse whitespace runs to one space, trim,
    * ASCII-lowercase. Both halves are chosen for EXACT engine parity,
    * not linguistic completeness: Java's `\s` includes U+000B where
    * RE2's does not (the oracle's class is widened to `[\s\x0B]` to
    * match), and locale lowercasing diverges between engines on
    * full-case expansions (Java ROOT maps U+0130 to two code points),
    * so case folding is restricted to A–Z — a pure 1:1 code-point map
    * both engines replay via `translate`. Non-ASCII case thus carries
    * through unfolded, identically, in both engines.
    */
  def normalize(s: String): String = {
    if (s == null) return ""
    val collapsed = s.replaceAll("\\s+", " ").trim
    val sb = new java.lang.StringBuilder(collapsed.length)
    var i = 0
    while (i < collapsed.length) {
      val c = collapsed.charAt(i)
      sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      i += 1
    }
    sb.toString
  }

  /** Bucket of the n-gram starting at `i` (chars as UTF-16 units — code
    * points for BMP text, the parity contract).
    */
  private def bucketAt(t: String, i: Int, n: Int): Int = {
    var h = 0L
    var j = 0
    while (j < n) { h = h * GramB + t.charAt(i + j).toLong; j += 1 }
    (h % Dim).toInt
  }

  /** All 1..MaxN-gram buckets of the normalized text. */
  def buckets(normalized: String): Array[Int] = {
    val len = normalized.length
    if (len == 0) return Array.empty
    val out = new scala.collection.mutable.ArrayBuffer[Int](len * MaxN)
    var n = 1
    while (n <= MaxN) {
      var i = 0
      while (i + n <= len) { out += bucketAt(normalized, i, n); i += 1 }
      n += 1
    }
    out.toArray
  }

  /** The trained model: per-lang quantized Laplace-smoothed log-prob
    * deltas over the floor (`delta(b) = q(log((c_b+1)/(total+Dim))) -
    * q(log(1/(total+Dim)))`, all >= 0), per-lang floors, per-lang
    * priors. Pure function of [[SeedCorpus]].
    */
  final case class Model(
      deltas: Array[Array[Long]], // [lang][bucket], dense Dim
      floors: Array[Long],
      priors: Array[Long])

  private def q(x: Double): Long = math.round(x * Scale)

  val model: Model = {
    val nLang = Langs.length
    val counts = Array.fill(nLang)(new Array[Long](Dim))
    val totals = new Array[Long](nLang)
    val sentences = new Array[Long](nLang)
    SeedCorpus.foreach { case (lang, text) =>
      val li = Langs.indexOf(lang)
      require(li >= 0, s"seed sentence with unknown lang $lang")
      sentences(li) += 1
      buckets(normalize(text)).foreach { b =>
        counts(li)(b) += 1
        totals(li) += 1
      }
    }
    val floors = Array.tabulate(nLang)(li =>
      q(StrictMath.log(1.0 / (totals(li) + Dim).toDouble)))
    val deltas = Array.tabulate(nLang) { li =>
      Array.tabulate(Dim) { b =>
        val c = counts(li)(b)
        if (c == 0L) 0L
        else q(StrictMath.log((c + 1).toDouble /
          (totals(li) + Dim).toDouble)) - floors(li)
      }
    }
    val nTotal = sentences.sum.toDouble
    val priors = Array.tabulate(nLang)(li =>
      q(StrictMath.log(sentences(li) / nTotal)))
    Model(deltas, floors, priors)
  }

  /** Quantized per-lang scores and the gram count:
    * `score_L = prior_L + n·floor_L + Σ delta_L(bucket)` — exact BIGINT,
    * order-independent, replayed bit-for-bit by the oracle.
    */
  def scores(text: String): (Long, Array[Long]) = {
    val bs = buckets(normalize(text))
    val out = new Array[Long](Langs.length)
    var li = 0
    while (li < out.length) {
      var s = model.priors(li) + bs.length * model.floors(li)
      val d = model.deltas(li)
      var i = 0
      while (i < bs.length) { s += d(bs(i)); i += 1 }
      out(li) = s
      li += 1
    }
    (bs.length.toLong, out)
  }

  /** Argmax with first-wins tie-break in [[Langs]] order; [[Unknown]]
    * for null/empty/whitespace-only text.
    */
  def predict(text: String): String = {
    val (n, s) = scores(text)
    if (n == 0L) Unknown
    else {
      var best = 0
      var li = 1
      while (li < s.length) {
        if (s(li) > s(best)) best = li
        li += 1
      }
      Langs(best)
    }
  }

  /** Per-document scoring projection (q162): map-only — the 100 TB
    * shape is a projected scan with the few-KB model in executor code,
    * no shuffle, no broadcast needed.
    */
  def predictDocs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, t) =>
        val (n, s) = scores(t)
        val pred = if (n == 0L) Unknown
        else Langs(s.indices.maxBy(i => (s(i), -i)))
        (id, n, s(0), s(1), s(2), s(3), s(4), pred)
      }
      .toDF(idCol, "n_grams", "s_en", "s_es", "s_de", "s_fr", "s_zh",
        "lang_pred")
  }
}
