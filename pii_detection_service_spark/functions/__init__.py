"""Pure-Python semantic kernels shared by Arrow UDFs and golden tests."""
