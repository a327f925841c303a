"""Sources — S1-S7 of SURVEY.md §2.1, Spark-native."""
