"""English word tokenization matching the reference's
`nltk.word_tokenize(sentence.strip().lower())` (util/data_gen.py:31).

nltk's `word_tokenize` = punkt sentence split + TreebankWordTokenizer.
The punkt model is a downloaded data file that may be absent in hermetic
environments; the Treebank tokenizer itself is pure regex. We use punkt when
its data is installed, else a conservative regex sentence splitter. For the
single-sentence queries of Charades/ActivityNet/TACoS the two paths agree.
"""
import re

_PUNKT_OK = None
_TREEBANK = None


def _treebank():
    global _TREEBANK
    if _TREEBANK is None:
        from nltk.tokenize.treebank import TreebankWordTokenizer

        _TREEBANK = TreebankWordTokenizer()
    return _TREEBANK


def _punkt_available():
    global _PUNKT_OK
    if _PUNKT_OK is None:
        try:
            from nltk.tokenize import sent_tokenize

            sent_tokenize("ping.", language="english")
            _PUNKT_OK = True
        except LookupError:
            _PUNKT_OK = False
    return _PUNKT_OK


_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+(?=[^\s])")


def sentences(text):
    if _punkt_available():
        from nltk.tokenize import sent_tokenize

        return sent_tokenize(text, language="english")
    return [s for s in _SENT_SPLIT.split(text) if s]


def word_tokenize(text, language="english"):
    tok = _treebank()
    out = []
    for sent in sentences(text):
        out.extend(tok.tokenize(sent))
    return out


def tokenize_query(sentence):
    """The exact per-record call used by all dataset processors."""
    return word_tokenize(sentence.strip().lower(), language="english")
