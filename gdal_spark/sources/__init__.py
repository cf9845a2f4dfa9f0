"""Sources & sinks: testdata loaders, partitioned tile sink with resume."""
