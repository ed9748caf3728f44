from dwcgan_tpu.text.vocab import Vocab, PAD, BOS, EOS, UNK, tokens_to_ids, pad_tokens  # noqa: F401
from dwcgan_tpu.text.synthesis import TextSynthesizer, CELEBA_ATTRS  # noqa: F401
