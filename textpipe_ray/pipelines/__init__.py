"""Pipeline assembly: flagship quality-filter job, spec registry, runner."""
