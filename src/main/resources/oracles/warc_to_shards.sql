SELECT CAST(shard AS INTEGER) AS shard, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens, CAST(min_id AS BIGINT) AS min_id, CAST(max_id AS BIGINT) AS max_id, CAST(sum_id AS BIGINT) AS sum_id, CAST(max_chunk AS BIGINT) AS max_chunk
FROM (VALUES
(0,10,2028,31,175,759,7),
(1,7,1677,4,259,732,14),
(2,6,1652,1,224,496,20),
(3,9,1826,0,266,754,28),
(4,6,1805,9,75,208,35),
(5,8,1730,7,42,197,41),
(6,8,1649,2,252,1160,48),
(7,7,1687,6,56,195,54)
) AS t(shard, n_docs, n_tokens, min_id, max_id, sum_id, max_chunk)
ORDER BY shard