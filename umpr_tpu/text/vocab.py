"""Vocabulary and word-embedding table.

Reproduces the observable behavior of the reference's ``Word2vec`` class
(src/word2vec.py:6-67):

- indices 0/1/2 are reserved for ``<PAD>``/``<UNK>``/``<NUM>`` and carry
  **zero** embedding vectors (word2vec.py:9-20);
- ``sent2indices`` maps pure-digit tokens to ``<NUM>``, out-of-vocabulary
  tokens to ``<UNK>``, treats '.' as whitespace, and optionally
  truncates/pads to ``align_length`` (word2vec.py:23-36);
- the GloVe text loader appends words in file order (word2vec.py:46-52).

The gensim loader of the reference (word2vec.py:54-64) required the gensim
package, which this environment does not ship; three replacements cover it:

- ``source='gensim'`` accepts the reference's actual input — a
  ``gensim.models.Word2Vec.save()`` model file — parsed WITHOUT gensim by
  ``umpr_tpu.text.gensim_load`` (restricted stub unpickler + .npy sidecar
  restore), reproducing the reference's iteration order, count sort, and
  its break-at-``len(embedding) >= vocab_size`` truncation quirk exactly;
- ``source='arrays'`` for the pretraining path: the pretrainers
  (umpr_tpu/pretrain) train their own skip-gram embeddings and hand the
  (vocab, vectors) pair straight in, sorted by corpus frequency and
  truncated to ``vocab_size`` exactly like the reference's gensim path did;
- ``source='word2vec'`` for user-supplied models: the standard word2vec
  TEXT format (header line ``<count> <dim>``, then ``word v1..vD`` rows).
  gensim's ``save_word2vec_format`` writes rows in descending corpus
  frequency, so truncating to ``vocab_size`` rows reproduces the
  reference's sort-by-frequency-then-truncate semantics
  (word2vec.py:57-64).  A word2vec header is also auto-detected on the
  default glove path, so ``--word2vec_file model.txt`` works from the CLI
  with either format.
"""

from __future__ import annotations

import numpy as np


class Word2vec:
    PAD = "<PAD>"
    UNK = "<UNK>"
    NUM = "<NUM>"

    def __init__(self, emb_path=None, source="glove", vocab_size=0, *,
                 vocab=None, vectors=None, counts=None):
        assert source in ("glove", "word2vec", "gensim", "arrays"), \
            "Please set embedding source name correctly"
        self.padding = self.PAD
        self.unknown = self.UNK
        self.number = self.NUM
        self.vocab = [self.PAD, self.UNK, self.NUM]
        self.word2index = {self.PAD: 0, self.UNK: 1, self.NUM: 2}

        if source == "glove":
            # CLI convenience: sniff the two binary-ish alternatives
            from .gensim_load import sniff_pickle
            if sniff_pickle(emb_path):
                source = "gensim"
            elif self._has_word2vec_header(emb_path):
                source = "word2vec"
        if source == "gensim":
            words, vecs = self._read_gensim(emb_path, vocab_size)
        elif source == "glove":
            words, vecs = self._read_glove(emb_path)
        elif source == "word2vec":
            words, vecs = self._read_word2vec_text(emb_path)
            if vocab_size > 0:
                # rows are stored most-frequent-first; head == the
                # reference's sort-by-count truncation (word2vec.py:57-58)
                words, vecs = words[:vocab_size], vecs[:vocab_size]
        else:  # 'arrays': in-memory vocabulary, e.g. from the skip-gram pretrainer
            words, vecs = list(vocab), np.asarray(vectors, dtype=np.float32)
            if counts is not None and vocab_size > 0:
                # Reference gensim path: sort by corpus frequency, truncate
                # (word2vec.py:57-58).
                order = np.argsort(-np.asarray(counts), kind="stable")[:vocab_size]
                words = [words[i] for i in order]
                vecs = vecs[order]
            elif vocab_size > 0:
                words, vecs = words[:vocab_size], vecs[:vocab_size]

        # Reference-exact id assignment (word2vec.py:50-52), including its
        # quirk: a duplicate word (or a literal '<PAD>'/'<UNK>'/'<NUM>'
        # token in the file) overwrites its dict entry WITHOUT advancing
        # len(word2index), silently shifting every later word's embedding
        # row by one.  Clean GloVe releases have no duplicates; warn loudly
        # if this file does, because training would be silently corrupted.
        before = len(self.word2index)
        for w in words:
            self.word2index[w] = len(self.word2index)
        self.vocab.extend(words)
        dupes = before + len(words) - len(self.word2index)
        if dupes:
            import logging
            logging.getLogger().warning(
                f"word2vec file has {dupes} duplicate/reserved words; "
                "matching the reference, every word after the first "
                "duplicate maps to the WRONG embedding row -- deduplicate "
                "the file.")

        dim = vecs.shape[1] if len(vecs) else 0
        self.embedding = np.concatenate(
            [np.zeros((3, dim), dtype=np.float32), vecs.astype(np.float32)], axis=0
        )
        self.word_dim = dim

    # ------------------------------------------------------------------
    def sent2indices(self, sentence, align_length=0):
        """Tokenize-by-whitespace and map tokens to ids.

        '.' is treated as a space; digit-only tokens map to <NUM>; unknown
        tokens map to <UNK>.  When ``align_length>0`` the output is truncated
        and right-padded with <PAD> to exactly that length
        (reference: word2vec.py:23-36).
        """
        indices = []
        for w in sentence.replace(".", " ").strip().split():
            if w.isdigit():
                indices.append(2)
            else:
                indices.append(self.word2index.get(w, 1))
            if 0 < align_length <= len(indices):
                break
        if 0 < align_length and len(indices) < align_length:
            indices += [0] * (align_length - len(indices))
        return indices

    def pad(self, sequence, pad_length):
        if len(sequence) < pad_length:
            return list(sequence) + [0] * (pad_length - len(sequence))
        return list(sequence)[:pad_length]

    def __len__(self):
        return len(self.embedding)

    # ------------------------------------------------------------------
    @staticmethod
    def _read_gensim(emb_path, vocab_size):
        """Load a ``gensim.models.Word2Vec.save()`` model file without the
        gensim package (umpr_tpu.text.gensim_load) and reproduce the
        reference's consumption semantics EXACTLY (word2vec.py:54-64):

        - ``vocab_size == 0``: every word, in the model dict's stored
          iteration order (gensim's corpus-discovery order);
        - ``vocab_size > 0``: stable-sort by corpus count descending, then
          the reference's loop breaks once ``len(self.embedding) >=
          vocab_size`` *counting the 3 reserved rows*, so it keeps
          ``vocab_size - 3`` words (floor 1) — quirk preserved."""
        from .gensim_load import extract_keyed_vectors, load_gensim_model
        vocab_dict, vectors = extract_keyed_vectors(load_gensim_model(emb_path))
        items = list(vocab_dict.items())
        if vocab_size > 0:
            items = sorted(items, key=lambda x: x[1].count,
                           reverse=True)[:vocab_size]
        words, rows = [], []
        for w, entry in items:
            words.append(w)
            rows.append(np.asarray(vectors[entry.index], dtype=np.float32))
            if 0 < vocab_size <= 3 + len(rows):
                break
        vecs = (np.stack(rows) if rows
                else np.zeros((0, vectors.shape[1] if vectors.ndim == 2 else 0),
                              np.float32))
        return words, vecs

    @staticmethod
    def _has_word2vec_header(emb_path):
        """True when the first line is exactly two positive integers
        (`<count> <dim>`) -- the word2vec text-format header.  A GloVe file
        starts with `word v1 ...` so the two formats cannot collide."""
        try:
            with open(emb_path, encoding="utf-8") as f:
                tokens = f.readline().split()
            return (len(tokens) == 2 and tokens[0].isdigit()
                    and tokens[1].isdigit())
        except Exception:
            return False

    @classmethod
    def _read_word2vec_text(cls, emb_path):
        """Parse the word2vec text format: header `<count> <dim>`, then
        `word v1 .. vD` per line (what gensim's save_word2vec_format
        emits, rows in descending corpus frequency)."""
        with open(emb_path, encoding="utf-8") as f:
            header = f.readline().split()
        count, dim = int(header[0]), int(header[1])
        words, vecs = cls._read_glove(emb_path, skip_rows=1)
        if len(words) != count or (len(vecs) and vecs.shape[1] != dim):
            raise ValueError(
                f"word2vec file {emb_path}: header says {count}x{dim}, "
                f"found {len(words)}x{vecs.shape[1] if len(vecs) else 0}")
        return words, vecs

    @staticmethod
    def _read_glove(emb_path, skip_rows=0):
        """Parse a GloVe text file: `word v1 v2 ... vD` per line.

        Primary path uses pandas' C csv parser (the reference's python loop
        over 400k lines is its host hot spot #1, word2vec.py:46-52); falls
        back to a python loop for irregular files (quotes, stray
        whitespace words)."""
        try:
            import pandas as pd
            df = pd.read_csv(emb_path, sep=" ", header=None, quoting=3,
                             na_filter=False, dtype={0: str}, engine="c",
                             skiprows=skip_rows)
            words = df.iloc[:, 0].tolist()
            vecs = df.iloc[:, 1:].to_numpy(dtype=np.float32)
            if not np.isfinite(vecs).all():
                raise ValueError("non-numeric vector entries")
            return words, vecs
        except Exception:
            pass
        words = []
        rows = []
        dim = None
        deferred = []  # ragged lines seen before dim is established

        def absorb(tokens, d):
            """Multi-token words (e.g. glove.840B's '. . .') put spaces in
            the word: the vector is the last `d` fields, the word is
            everything before (the reference crashes here, so any recovery
            is an upgrade).  Returns True if the line parsed."""
            if len(tokens) < d + 1:
                return False
            try:
                row = np.asarray(tokens[-d:], dtype=np.float32)
            except ValueError:
                return False  # unparsable line: skip rather than crash
            words.append(" ".join(tokens[:-d]))
            rows.append(row)
            return True

        with open(emb_path, encoding="utf-8") as f:
            for _ in range(skip_rows):
                f.readline()
            for line in f:
                tokens = line.split()
                if len(tokens) < 2:
                    continue
                if dim is None:
                    # establish the vector width from the first clean line
                    # (all-numeric tail); BUFFER ragged lines until then
                    try:
                        row = np.asarray(tokens[1:], dtype=np.float32)
                    except ValueError:
                        deferred.append(tokens)
                        continue
                    dim = len(row)
                    for t in deferred:  # replay, keeping file order
                        absorb(t, dim)
                    deferred.clear()
                    words.append(tokens[0])
                    rows.append(row)
                    continue
                absorb(tokens, dim)
        vecs = np.stack(rows) if rows else np.zeros((0, 0), np.float32)
        return words, vecs
