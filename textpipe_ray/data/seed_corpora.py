"""Deterministic per-language seed corpora for the tiny committed models.

These paragraphs are generic encyclopedic prose written for this repo
(no external data).  They train (a) the char-ngram language-ID model
and (b) the char-ngram perplexity LMs — the same role the committed
``tests/models/gensim_test_{en,nl}.kv`` artifacts play in the
reference's test strategy (/root/reference/tests/, SURVEY.md §5):
tiny, versioned, deterministic.

Do not edit casually: retraining changes langid/perplexity outputs and
therefore keep/drop labels; bump MODELS_VERSION when you do.
"""

MODELS_VERSION = "1"

SEED_CORPORA: dict[str, str] = {
    "en": (
        "Text mining is the process of deriving high quality information from "
        "text. The language of a document can be detected from the characters "
        "it contains and the words that appear most often. A city is a large "
        "human settlement where people live and work together. The history of "
        "science shows that simple models are often the most useful ones. "
        "Water flows from the mountains to the sea and the river carries small "
        "stones along the way. In the morning the children walk to school and "
        "in the evening they return to their homes. The government of the "
        "country announced a new plan for public health and education. Many "
        "people enjoy reading books about nature, music and the stars. The "
        "weather in the north is cold in winter and warm in summer. She opened "
        "the window and looked at the quiet street below. The library contains "
        "thousands of old books and manuscripts from many different countries. "
        "This is a test sentence for testing the text of the system and it "
        "should be clear and easy to read for everyone who wants to learn."
    ),
    "nl": (
        "Textmining verwijst naar het proces om met allerhande technieken "
        "waardevolle informatie te halen uit grote hoeveelheden tekst. De taal "
        "van een document kan worden herkend aan de letters en de woorden die "
        "het vaakst voorkomen. Een stad is een grote nederzetting waar mensen "
        "samen wonen en werken. De geschiedenis van de wetenschap laat zien "
        "dat eenvoudige modellen vaak het nuttigst zijn. Het water stroomt van "
        "de bergen naar de zee en de rivier voert kleine stenen met zich mee. "
        "In de ochtend lopen de kinderen naar school en in de avond keren zij "
        "terug naar huis. De regering van het land kondigde een nieuw plan aan "
        "voor de volksgezondheid en het onderwijs. Veel mensen lezen graag "
        "boeken over de natuur, muziek en de sterren. Het weer in het noorden "
        "is koud in de winter en warm in de zomer. Zij opende het raam en keek "
        "naar de stille straat beneden. Dit is een zin om de tekst van het "
        "systeem te testen en hij moet duidelijk en gemakkelijk te lezen zijn."
    ),
    "fr": (
        "La fouille de textes est le processus qui permet de tirer des "
        "informations de grande qualité à partir du texte. La langue d'un "
        "document peut être reconnue grâce aux lettres et aux mots qui "
        "apparaissent le plus souvent. Une ville est un grand établissement "
        "humain où les gens vivent et travaillent ensemble. L'histoire des "
        "sciences montre que les modèles simples sont souvent les plus utiles. "
        "L'eau coule des montagnes vers la mer et la rivière emporte de "
        "petites pierres sur son chemin. Le matin les enfants vont à l'école "
        "et le soir ils rentrent chez eux. Le gouvernement du pays a annoncé "
        "un nouveau plan pour la santé publique et l'éducation. Beaucoup de "
        "gens aiment lire des livres sur la nature, la musique et les étoiles. "
        "Le temps dans le nord est froid en hiver et chaud en été. Elle a "
        "ouvert la fenêtre et a regardé la rue calme en bas. Ceci est une "
        "phrase pour tester le texte du système et elle doit être claire."
    ),
    "es": (
        "La minería de textos es el proceso de obtener información de alta "
        "calidad a partir del texto. El idioma de un documento puede "
        "reconocerse por las letras y las palabras que aparecen con mayor "
        "frecuencia. Una ciudad es un gran asentamiento humano donde las "
        "personas viven y trabajan juntas. La historia de la ciencia muestra "
        "que los modelos simples suelen ser los más útiles. El agua fluye de "
        "las montañas hacia el mar y el río arrastra pequeñas piedras por el "
        "camino. Por la mañana los niños caminan a la escuela y por la tarde "
        "regresan a sus casas. El gobierno del país anunció un nuevo plan para "
        "la salud pública y la educación. A mucha gente le gusta leer libros "
        "sobre la naturaleza, la música y las estrellas. El clima en el norte "
        "es frío en invierno y cálido en verano. Ella abrió la ventana y miró "
        "la calle tranquila de abajo. Esta es una frase para probar el texto "
        "del sistema y debe ser clara y fácil de leer para todos."
    ),
    "de": (
        "Textmining ist der Prozess, hochwertige Informationen aus Texten zu "
        "gewinnen. Die Sprache eines Dokuments kann an den Buchstaben und den "
        "am häufigsten vorkommenden Wörtern erkannt werden. Eine Stadt ist "
        "eine große menschliche Siedlung, in der Menschen zusammen leben und "
        "arbeiten. Die Geschichte der Wissenschaft zeigt, dass einfache "
        "Modelle oft die nützlichsten sind. Das Wasser fließt von den Bergen "
        "zum Meer und der Fluss trägt kleine Steine mit sich. Am Morgen gehen "
        "die Kinder zur Schule und am Abend kehren sie nach Hause zurück. Die "
        "Regierung des Landes kündigte einen neuen Plan für die öffentliche "
        "Gesundheit und die Bildung an. Viele Menschen lesen gern Bücher über "
        "die Natur, die Musik und die Sterne. Das Wetter im Norden ist im "
        "Winter kalt und im Sommer warm. Sie öffnete das Fenster und blickte "
        "auf die stille Straße hinunter. Dies ist ein Satz, um den Text des "
        "Systems zu prüfen, und er soll klar und leicht zu lesen sein."
    ),
    "it": (
        "L'estrazione di testo è il processo di ricavare informazioni di alta "
        "qualità dal testo. La lingua di un documento può essere riconosciuta "
        "dalle lettere e dalle parole che compaiono più spesso. Una città è un "
        "grande insediamento umano dove le persone vivono e lavorano insieme. "
        "La storia della scienza mostra che i modelli semplici sono spesso i "
        "più utili. L'acqua scorre dalle montagne verso il mare e il fiume "
        "trasporta piccole pietre lungo il cammino. Al mattino i bambini "
        "vanno a scuola e la sera tornano alle loro case. Il governo del "
        "paese ha annunciato un nuovo piano per la salute pubblica e "
        "l'istruzione. A molte persone piace leggere libri sulla natura, "
        "sulla musica e sulle stelle. Questa è una frase per provare il testo "
        "del sistema e deve essere chiara e facile da leggere per tutti."
    ),
    "pt": (
        "A mineração de texto é o processo de obter informações de alta "
        "qualidade a partir do texto. O idioma de um documento pode ser "
        "reconhecido pelas letras e pelas palavras que aparecem com mais "
        "frequência. Uma cidade é um grande assentamento humano onde as "
        "pessoas vivem e trabalham juntas. A história da ciência mostra que "
        "os modelos simples costumam ser os mais úteis. A água flui das "
        "montanhas para o mar e o rio carrega pequenas pedras pelo caminho. "
        "De manhã as crianças caminham para a escola e à tarde voltam para "
        "as suas casas. O governo do país anunciou um novo plano para a saúde "
        "pública e a educação. Muitas pessoas gostam de ler livros sobre a "
        "natureza, a música e as estrelas. Esta é uma frase para testar o "
        "texto do sistema e ela deve ser clara e fácil de ler para todos."
    ),
    "zh": (
        "文本挖掘是从文本中获取高质量信息的过程。文档的语言可以通过其中出现"
        "最频繁的字符和词语来识别。城市是人们共同生活和工作的大型聚居地。科"
        "学的历史表明,简单的模型往往是最有用的。水从山上流向大海,河流沿途"
        "带着小石头。早晨孩子们步行去学校,晚上他们回到家里。政府宣布了一项"
        "关于公共卫生和教育的新计划。许多人喜欢阅读关于自然、音乐和星星的书"
        "籍。北方的天气冬天寒冷,夏天温暖。她打开窗户,看着下面安静的街道。"
        "这是一个用来测试系统文本的句子,它应该清晰易读。图书馆收藏着来自许"
        "多不同国家的数千册古籍和手稿。"
    ),
}

# Per-language stopword lists (top function words drawn from the seed
# corpora) — used by the pages quality rules for non-English docs.
STOPWORDS: dict[str, list[str]] = {
    "en": "the of and a to in is you that it he was for on are as with his they at be this have from or by".split(),
    "nl": "de het een en van in is dat op te zij met voor naar aan om die er maar ook als bij dan uit".split(),
    "fr": "le la les de des du un une et à en est que qui dans pour sur avec ne pas ce il elle au se plus".split(),
    "es": "el la los las de del un una y a en es que se no por con para su al lo como más pero sus le".split(),
    "de": "der die das und in den von zu mit sich des auf für ist im dem nicht ein eine als auch es an".split(),
    "it": "il lo la i gli le di a da in con su per tra che e non si è un una sono del alla".split(),
    "pt": "o a os as de do da um uma e que em para com não por mais se como mas ao dos das".split(),
    "zh": list("的了是在和有一这不人我他们中为上个国"),
}
