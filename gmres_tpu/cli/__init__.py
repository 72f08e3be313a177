"""Command-line drivers (L7): ``pg`` (etbr_cmd/mna_cmd equivalent) and
``thermal`` (src_thermal main/main2 equivalent)."""
