from xclip_tpu.tokenizer.bpe import (  # noqa: F401
    DEFAULT_CONTEXT_LENGTH,
    SimpleTokenizer,
    basic_clean,
    canonicalize_text,
    decode,
    get_tokenizer,
    tokenize,
    whitespace_clean,
)
