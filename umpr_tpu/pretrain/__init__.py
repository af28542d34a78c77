from umpr_tpu.pretrain.word2vec_train import train_skipgram  # noqa: F401
