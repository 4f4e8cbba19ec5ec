"""Static data: seed corpora for model training, emoji tables, stopwords."""
