"""CLI drivers mirroring the reference's test binaries
(unit_test, spmm_test, spmv_test; UM twins live in *_test_um)."""
