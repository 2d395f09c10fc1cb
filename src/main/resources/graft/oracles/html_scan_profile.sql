SELECT CAST(userId AS BIGINT) AS userId, CAST(ts AS TIMESTAMP) AS ts, CAST(username AS VARCHAR) AS username, CAST(isFarmhand AS BOOLEAN) AS isFarmhand, CAST(isRanger AS BOOLEAN) AS isRanger
FROM (VALUES
  (4153, TIMESTAMP '2022-04-17 23:59:59', 'RybeR', FALSE, TRUE)) AS t(userId, ts, username, isFarmhand, isRanger)