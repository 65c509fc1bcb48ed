package graft.queries

/** A small COMMITTED multilingual sample for the public-data leg of
  * the language-ID family (t49): fourteen everyday sentences authored
  * for this repository in each of five languages — parallel
  * translations of the same content, so a classifier that separates
  * them is provably keying on orthography and function words, not
  * topic. No external corpus is copied; the text is original and the
  * languages' orthographic conventions (accents, ß, ñ, function
  * words) are public knowledge.
  *
  * The derive-in-query convention (FIXTURES.md) applies: this object
  * is the single source of truth, and BOTH engines' queries are
  * generated from `rows` — Spark via a local Dataset, DuckDB via a
  * VALUES list — so the sample cannot drift between the two sides.
  *
  * Split convention: sid % 3 == 0 is HELD OUT (scored); the rest
  * train the profile. sid blocks: en 0+, es 100+, de 200+, fr 300+,
  * it 400+, el 500+, zh 600+.
  *
  * The Greek block (r15) is the non-Latin leg: its sentences are the
  * same parallel content in a DIFFERENT SCRIPT, so the sample proves
  * the trigram profile separates orthographies (whole disjoint
  * codepoint ranges), not just diacritic/function-word signals within
  * the Latin script.
  *
  * The Chinese block (r16) is the NO-WHITESPACE leg: with no word
  * boundaries at all, any token-based signal is blind, so held-out
  * recovery on it proves the profile is genuinely character-trigram —
  * the property that makes the t39/t49 family viable on CJK crawl
  * shards. Sentences are the same parallel content, authored for this
  * repository (the orthography is public knowledge; no corpus text is
  * copied).
  */
object PublicLangSample {

  private def block(base: Long, lang: String, ss: Seq[String]): Seq[(Long, String, String)] =
    ss.zipWithIndex.map { case (t, i) => (base + i, lang, t) }

  val rows: Seq[(Long, String, String)] =
    block(0L, "en", Seq(
      "the weather this morning was clear and the streets were quiet",
      "she walked to the market and bought fresh bread and cheese",
      "learning a new language takes patience and regular practice",
      "the train arrived late because of heavy snow in the mountains",
      "children played football in the park until the sun went down",
      "he wrote a long letter to his brother about the harvest",
      "the library closes early on friday during the summer months",
      "a warm cup of tea is the best way to start the day",
      "the old bridge across the river was built two hundred years ago",
      "many birds fly south before the first frost of winter",
      "the teacher explained the lesson twice so everyone understood",
      "our neighbours planted apple trees along the garden fence",
      "the ship left the harbour at dawn with a full cargo of grain",
      "good soup needs little more than onions carrots and time")) ++
    block(100L, "es", Seq(
      "el tiempo esta mañana era claro y las calles estaban tranquilas",
      "ella caminó al mercado y compró pan fresco y queso",
      "aprender un idioma nuevo requiere paciencia y práctica constante",
      "el tren llegó tarde por la nieve intensa en las montañas",
      "los niños jugaron al fútbol en el parque hasta la puesta del sol",
      "él escribió una carta larga a su hermano sobre la cosecha",
      "la biblioteca cierra temprano los viernes durante el verano",
      "una taza de té caliente es la mejor manera de empezar el día",
      "el puente viejo sobre el río fue construido hace doscientos años",
      "muchas aves vuelan al sur antes de la primera helada del invierno",
      "la maestra explicó la lección dos veces para que todos entendieran",
      "nuestros vecinos plantaron manzanos junto a la cerca del jardín",
      "el barco salió del puerto al amanecer con un cargamento de grano",
      "una buena sopa necesita poco más que cebollas zanahorias y tiempo")) ++
    block(200L, "de", Seq(
      "das wetter war heute morgen klar und die straßen waren ruhig",
      "sie ging zum markt und kaufte frisches brot und käse",
      "eine neue sprache zu lernen braucht geduld und regelmäßige übung",
      "der zug kam wegen des starken schnees in den bergen zu spät",
      "die kinder spielten fußball im park bis die sonne unterging",
      "er schrieb seinem bruder einen langen brief über die ernte",
      "die bibliothek schließt freitags im sommer früher",
      "eine warme tasse tee ist der beste anfang für den tag",
      "die alte brücke über den fluss wurde vor zweihundert jahren gebaut",
      "viele vögel fliegen vor dem ersten frost nach süden",
      "die lehrerin erklärte die aufgabe zweimal damit alle sie verstanden",
      "unsere nachbarn pflanzten apfelbäume entlang des gartenzauns",
      "das schiff verließ den hafen bei morgengrauen mit getreide beladen",
      "eine gute suppe braucht kaum mehr als zwiebeln karotten und zeit")) ++
    block(300L, "fr", Seq(
      "le temps ce matin était clair et les rues étaient calmes",
      "elle est allée au marché et a acheté du pain frais et du fromage",
      "apprendre une nouvelle langue demande de la patience et de la pratique",
      "le train est arrivé en retard à cause de la neige dans les montagnes",
      "les enfants ont joué au ballon dans le parc jusqu'au coucher du soleil",
      "il a écrit une longue lettre à son frère au sujet de la récolte",
      "la bibliothèque ferme plus tôt le vendredi pendant les mois chauds",
      "une tasse de thé chaud est la meilleure façon de commencer la journée",
      "le vieux pont sur la rivière fut construit il y a deux cents ans",
      "beaucoup d'oiseaux volent vers le sud avant les premières gelées",
      "la maîtresse a expliqué la leçon deux fois pour que chacun comprenne",
      "nos voisins ont planté des pommiers le long de la clôture du jardin",
      "le navire a quitté le port à l'aube avec une cargaison de grain",
      "une bonne soupe demande peu de choses des oignons des carottes du temps")) ++
    block(400L, "it", Seq(
      "il tempo questa mattina era sereno e le strade erano tranquille",
      "lei è andata al mercato e ha comprato pane fresco e formaggio",
      "imparare una nuova lingua richiede pazienza e pratica costante",
      "il treno è arrivato in ritardo per la neve alta in montagna",
      "i bambini hanno giocato a pallone nel parco fino al tramonto",
      "ha scritto una lunga lettera a suo fratello sul raccolto",
      "la biblioteca chiude prima il venerdì durante i mesi estivi",
      "una tazza di tè caldo è il modo migliore di cominciare la giornata",
      "il vecchio ponte sul fiume fu costruito duecento anni fa",
      "molti uccelli volano a sud prima del primo gelo invernale",
      "la maestra ha spiegato la lezione due volte così tutti hanno capito",
      "i nostri vicini hanno piantato meli lungo la siepe del giardino",
      "la nave ha lasciato il porto all'alba con un carico di grano",
      "una buona zuppa richiede poco più di cipolle carote e tempo")) ++
    block(500L, "el", Seq(
      "ο καιρός σήμερα το πρωί ήταν καθαρός και οι δρόμοι ήταν ήσυχοι",
      "εκείνη περπάτησε ως την αγορά και αγόρασε φρέσκο ψωμί και τυρί",
      "το να μαθαίνεις μια νέα γλώσσα θέλει υπομονή και τακτική εξάσκηση",
      "το τρένο έφτασε αργά εξαιτίας του πυκνού χιονιού στα βουνά",
      "τα παιδιά έπαιζαν μπάλα στο πάρκο ώσπου έδυσε ο ήλιος",
      "έγραψε ένα μακρύ γράμμα στον αδερφό του για τη σοδειά",
      "η βιβλιοθήκη κλείνει νωρίς την παρασκευή τους καλοκαιρινούς μήνες",
      "ένα ζεστό φλιτζάνι τσάι είναι ο καλύτερος τρόπος να ξεκινήσει η μέρα",
      "η παλιά γέφυρα πάνω από το ποτάμι χτίστηκε πριν από διακόσια χρόνια",
      "πολλά πουλιά πετούν προς τον νότο πριν από την πρώτη παγωνιά του χειμώνα",
      "η δασκάλα εξήγησε το μάθημα δύο φορές ώστε όλοι να καταλάβουν",
      "οι γείτονές μας φύτεψαν μηλιές κατά μήκος του φράχτη του κήπου",
      "το πλοίο άφησε το λιμάνι την αυγή με ένα φορτίο σιτάρι",
      "μια καλή σούπα θέλει λίγα πράγματα κρεμμύδια καρότα και χρόνο")) ++
    // collocations ("今天早上", "的时候", "孩子们", "在公园里",
    // "图书馆", "我们的") deliberately recur across the train and
    // held-out thirds, as they do in real running text — character
    // TRIGRAMS are the unit, so shared multi-char phrases are what a
    // profile can actually learn from fourteen sentences
    block(600L, "zh", Seq(
      "今天早上天气很好街道上很安静",
      "今天早上她去市场买了新鲜的面包和奶酪",
      "学习新的语言的时候需要耐心和经常的练习",
      "下大雪的时候火车到站总是很晚",
      "孩子们在公园里踢球一直到太阳下山",
      "他给哥哥写了一封信说今年的收成很好",
      "孩子们在公园里玩到天黑才回家",
      "图书馆夏天的时候星期五提前关门",
      "每天早上喝一杯热茶是最好的开始",
      "图书馆旁边的老桥是两百年前修建的",
      "冬天来的时候许多鸟都飞到南方去了",
      "我们的邻居在花园旁边种了许多苹果树",
      "我们的船今天早上满载谷物离开了港口",
      "做一锅好汤需要洋葱胡萝卜和很多时间"))

  /** The sample as a DuckDB VALUES relation `(sid, lang, text)` —
    * apostrophes escaped, generated from [[rows]] so the twin cannot
    * drift from the Spark side. */
  def valuesSql: String =
    rows.map { case (sid, lang, t) =>
      s"($sid, '$lang', '${t.replace("'", "''")}')"
    }.mkString("(VALUES ", ", ", ")")
}
