"""Pure numpy codec kernels (no Spark imports): rle, bitpack, forref, dictionary, fsst."""
