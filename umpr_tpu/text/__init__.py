from umpr_tpu.text.vocab import Word2vec  # noqa: F401
from umpr_tpu.text.stoplists import STOP_WORDS, PUNCTUATIONS  # noqa: F401
