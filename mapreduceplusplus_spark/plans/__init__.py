"""MapReduce pipeline plans — queries exercising the ``mr`` UDF contract."""
