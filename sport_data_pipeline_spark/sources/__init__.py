"""Sources: bronze landing + refinement into the silver catalog."""
