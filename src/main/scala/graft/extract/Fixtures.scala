package graft.extract

/** Golden HTML fixtures ported verbatim from
  * `/root/reference/sidecar/test_chunker.py:17-140`. These define the
  * per-turn text-equality surface (BASELINE.json north_rule).
  */
object Fixtures {

  val RECIPE_HTML_SINGLE_QUOTE: String =
    """<html lang="fr-CA">
<head>
  <title>Pâté chinois classique - Ricardo</title>
  <script type='application/ld+json'>
  {
    "@context": "https://schema.org",
    "@type": "Recipe",
    "name": "Pâté chinois classique",
    "description": "La meilleure recette de pâté chinois, un classique québécois.",
    "author": {"@type": "Person", "name": "Ricardo Larrivée"},
    "datePublished": "2023-05-15",
    "keywords": "pâté chinois, québécois, classique",
    "recipeIngredient": [
      "1 lb boeuf haché",
      "1 boîte de maïs en crème",
      "4 pommes de terre"
    ],
    "recipeInstructions": [
      {
        "@type": "HowToSection",
        "name": "Préparation de la viande",
        "itemListElement": [
          {"@type": "HowToStep", "text": "Faire revenir le boeuf haché."},
          {"@type": "HowToStep", "text": "Assaisonner avec sel et poivre."}
        ]
      },
      {
        "@type": "HowToStep",
        "text": "Étaler le maïs en crème sur la viande."
      },
      {
        "@type": "HowToStep",
        "text": "Couvrir de purée de pommes de terre."
      }
    ],
    "prepTime": "PT20M",
    "cookTime": "PT45M",
    "totalTime": "PT1H5M",
    "aggregateRating": {
      "@type": "AggregateRating",
      "ratingValue": "4.8",
      "ratingCount": "1250"
    },
    "recipeCategory": "Plat principal",
    "recipeYield": "6 portions",
    "recipeSubCategories": ["Comfort food", "Traditionnel"]
  }
  </script>
</head>
<body>
  <main>
    <h1>Pâté chinois classique</h1>
    <p>La meilleure recette de pâté chinois, un classique québécois réconfortant pour toute la famille.</p>
  </main>
</body>
</html>
"""

  val ARTICLE_HTML_DOUBLE_QUOTE: String =
    """<html lang="en">
<head>
  <title>AI Revolution in 2025 - SketchyNews</title>
  <script type="application/ld+json">
  {
    "@context": "https://schema.org",
    "@type": "NewsArticle",
    "headline": "The AI Revolution Is Here and It's Weirder Than You Think",
    "description": "A deep dive into the latest AI developments.",
    "author": {"@type": "Person", "name": "Jane Doe"},
    "datePublished": "2025-03-10T14:00:00Z",
    "dateModified": "2025-03-11T09:30:00Z",
    "keywords": ["AI", "technology", "future"],
    "articleSection": "Technology"
  }
  </script>
</head>
<body>
  <article>
    <h1>The AI Revolution Is Here</h1>
    <p>Artificial intelligence is transforming every industry at an unprecedented pace, from healthcare to finance.</p>
    <p>Experts predict that by 2030, AI will be integrated into nearly every aspect of daily life.</p>
  </article>
</body>
</html>
"""

  val OPENGRAPH_ONLY_HTML: String =
    """<html lang="en">
<head>
  <title>OpenGraph Only Page</title>
  <meta property="og:title" content="The Real OG Title" />
  <meta property="og:description" content="This page only has OpenGraph tags." />
  <meta property="og:image" content="https://example.com/image.jpg" />
  <meta property="og:type" content="article" />
  <meta property="article:author" content="OG Author" />
  <meta property="article:published_time" content="2024-12-01T10:00:00Z" />
  <meta property="article:tag" content="test" />
  <meta property="article:tag" content="opengraph" />
  <meta name="twitter:title" content="Twitter Title Fallback" />
  <meta name="twitter:description" content="Twitter description fallback." />
</head>
<body>
  <main>
    <h1>OpenGraph Only Page</h1>
    <p>This page has no JSON-LD at all, only OpenGraph and Twitter Card meta tags.</p>
  </main>
</body>
</html>
"""

  val PLAIN_HTML: String =
    """<html>
<head>
  <title>Just a Plain Page</title>
  <meta name="description" content="A simple page with no structured metadata." />
  <meta name="author" content="Plain Author" />
</head>
<body>
  <h1>Welcome to the Plain Page</h1>
  <p>This is a completely plain HTML page with no JSON-LD and no OpenGraph tags. Only basic HTML metadata.</p>
</body>
</html>
"""

  /** All four, keyed the way the synthetic transcript generator tags turns. */
  val all: Map[String, String] = Map(
    "recipe" -> RECIPE_HTML_SINGLE_QUOTE,
    "article" -> ARTICLE_HTML_DOUBLE_QUOTE,
    "opengraph" -> OPENGRAPH_ONLY_HTML,
    "plain" -> PLAIN_HTML)
}
