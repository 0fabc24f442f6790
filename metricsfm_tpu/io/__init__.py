"""Feature/match/track stores, checkpoint-resume, interop exports."""
