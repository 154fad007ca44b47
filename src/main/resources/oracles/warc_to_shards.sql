SELECT CAST(shard AS INTEGER) AS shard, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens, CAST(min_id AS BIGINT) AS min_id, CAST(max_id AS BIGINT) AS max_id, CAST(sum_id AS BIGINT) AS sum_id, CAST(max_chunk AS BIGINT) AS max_chunk
FROM (VALUES
(0,9,1975,33,126,666,7),
(1,8,1432,37,455,1464,13),
(2,7,1828,1,2000003,2000602,20),
(3,8,1746,0,168,398,27),
(4,5,1576,9,75,196,33),
(5,8,1769,7,42,197,40),
(6,9,1840,2,252,982,47),
(7,5,1434,8,80,189,53)
) AS t(shard, n_docs, n_tokens, min_id, max_id, sum_id, max_chunk)
ORDER BY shard