"""Amazon Mechanical Turk user-study tooling (MTurk/ in the reference):
stimulus generation, results analysis, and TUM→KinectFusion conversion."""
