"""Frozen BPE merge list (trained by scripts/train_bpe_merges.py on the sf0.01 fixture).

Applied in order as delimiter-safe string replaces; regenerate with that script."""

MERGES = [
    ('e', 'r'),
    ('i', 'n'),
    ('o', 'w'),
    ('o', 'r'),
    ('s', 't'),
    ('m', 'er'),
    ('a', 't'),
    ('l', 'u'),
    ('p', 'a'),
    ('pa', 'r'),
    ('o', 'in'),
    ('j', 'oin'),
    ('s', 'h'),
    ('h', 'a'),
    ('ha', 'sh'),
    ('r', 'ow'),
]
