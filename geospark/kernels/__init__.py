"""Pure-NumPy geometry kernels. No Spark imports here — these run inside
pandas/Arrow UDF batches on executors and in driver-side tests."""
