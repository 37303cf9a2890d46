from aws_genaric_datapipeline_spark.cli import main

main()
