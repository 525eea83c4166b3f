"""End-to-end workflow jobs: thin CLI entry points composing sources →
operators → sinks, reproducing the reference's flagship pipelines
(SURVEY §7.0: ``cmspark/jobs/`` — thin CLI entry points reproducing
each reference workflow)."""
