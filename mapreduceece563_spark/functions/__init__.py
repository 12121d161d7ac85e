from .text import (  # noqa: F401
    normalize_word,
    tokenize_lines,
    words_from_documents,
)
from .hashing import (  # noqa: F401
    HASH_MOD,
    MINHASH_PERMS,
    poly_hash,
    poly_hash_sql,
)
