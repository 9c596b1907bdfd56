from multimodalsimilar_tpu.data.text import (
    REMOVE_WORDS, gen_title, load_stopwords, preprocess_for_infer)
