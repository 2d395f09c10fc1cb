SELECT CAST(id AS BIGINT) AS id, CAST(username AS VARCHAR) AS username, CAST(ts AS TIMESTAMP) AS ts, CAST(subject AS VARCHAR) AS subject, CAST(content AS VARCHAR) AS content
FROM (VALUES
  (781884, 'Lazyforlife', TIMESTAMP '2022-12-31 18:59:59', 'trade ratio bot', 'hey there, ffff pointed me to you for 3rd party sites. I think you run buddy.farm right? super cool site!<br>
<br>
I''m thinking of making something to track trade ratios, ffff recommended that I talk to you about how you scrap data out of the game<br>
<br>
you open to chatting? Is it an extension? headless browser? What''s been allowed/disallowed? <br>
<br>
thanks in advance'),
  (782186, 'Lazyforlife', TIMESTAMP '2022-05-25 18:29:59', 'trade ratio bot', 'hey there, ffff pointed me to you for 3rd party sites. I think you run buddy.farm right? super cool site!<br>
<br>
I''m thinking of making something to track trade ratios, ffff recommended that I talk to you about how you scrap data out of the game<br>
<br>
you open to chatting? Is it an extension? headless browser? What''s been allowed/disallowed? <br>
<br>
thanks in advance')) AS t(id, username, ts, subject, content)
ORDER BY id