from xclip_tpu.tokenizer.bpe import (  # noqa: F401
    DEFAULT_CONTEXT_LENGTH,
    SimpleTokenizer,
    basic_clean,
    canonicalize_text,
    decode,
    get_clean_fn,
    get_tokenizer,
    random_mask_tokenize,
    simple_mask_tokenize,
    syntax_mask_tokenize,
    tokenize,
    whitespace_clean,
)
from xclip_tpu.tokenizer.hf import HFTokenizer, SigLipTokenizer  # noqa: F401
